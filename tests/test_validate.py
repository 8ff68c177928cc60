"""Index integrity validator (sources/validate.py): clean index reports
all-zero; each injected corruption trips exactly the check built for it."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.sources.validate import is_clean, validate_index

N_BUCKETS = 8


@pytest.fixture(scope="module")
def built_index(spark, small_corpus, tmp_path_factory):
    from search_engine_core_spark.sources.index_io import IndexBuilder

    d = str(tmp_path_factory.mktemp("validate") / "idx")
    IndexBuilder(spark, d, n_buckets=N_BUCKETS).build(small_corpus)
    return d


def _copy(src: str, tmp_path) -> str:
    dst = str(tmp_path / "idx_corrupt")
    shutil.copytree(src, dst)
    return dst


def _rewrite(spark, table_dir: str, transform,
             partition_by: str | tuple[str, ...] | None = None,
             base_path: bool = False):
    """Read a table dir, apply ``transform``, replace the dir (write-aside
    then swap, since Spark can't overwrite its own input)."""
    reader = spark.read
    if base_path:
        reader = reader.option("basePath", table_dir)
    df = transform(reader.parquet(table_dir))
    tmp = table_dir + "_tmp"
    w = df.write.mode("overwrite")
    if partition_by:
        cols = (partition_by,) if isinstance(partition_by, str) else partition_by
        w = w.partitionBy(*cols)
    w.parquet(tmp)
    shutil.rmtree(table_dir)
    shutil.move(tmp, table_dir)


def test_clean_index_validates(spark, built_index):
    report = validate_index(spark, built_index, N_BUCKETS, deep=True)
    assert is_clean(report), report
    # every advertised check actually ran
    assert set(report) == {
        "df_vs_blocks", "block_align", "block_order", "max_tf_vs_blocks",
        "bucket_key", "dfreq_vs_postings", "stats_vs_docs", "docs_unique",
        "decode_error", "decode_count", "decode_tf", "orphan_postings",
        "merge_inflight",
    }


def test_dfreq_drift_flagged(spark, built_index, tmp_path):
    d = _copy(built_index, tmp_path)
    _rewrite(
        spark, f"{d}/dfreq",
        lambda df: df.withColumn(
            "df",
            F.when(F.col("term") == df.select("term").first()["term"],
                   F.col("df") + 1).otherwise(F.col("df")),
        ),
    )
    report = validate_index(spark, d, N_BUCKETS)
    assert report["dfreq_vs_postings"] >= 1
    assert report["df_vs_blocks"] == 0  # postings themselves untouched


def test_max_tf_corruption_flagged(spark, built_index, tmp_path):
    d = _copy(built_index, tmp_path)
    _rewrite(
        spark, f"{d}/postings",
        lambda p: p.withColumn(
            "max_tf",
            F.when(F.col("term") == p.select("term").first()["term"],
                   F.col("max_tf") + 7).otherwise(F.col("max_tf")),
        ),
        partition_by="bucket", base_path=True,
    )
    report = validate_index(spark, d, N_BUCKETS, deep=True)
    assert report["max_tf_vs_blocks"] >= 1
    # the decoded tfs now sit below the inflated cap, so decode_tf stays
    # quiet — max_tf_vs_blocks is the check that owns this corruption
    assert report["decode_tf"] == 0


def test_df_vs_blocks_and_decode_count_flagged(spark, built_index, tmp_path):
    d = _copy(built_index, tmp_path)
    _rewrite(
        spark, f"{d}/postings",
        lambda p: p.withColumn("df", F.col("df") + 1),
        partition_by="bucket", base_path=True,
    )
    report = validate_index(spark, d, N_BUCKETS, deep=True)
    assert report["df_vs_blocks"] >= 1
    # the per-list decoder sizes from block_n (untouched), so the lists
    # still decode — the COUNT check is what owns a df lie
    assert report["decode_error"] == 0
    assert report["decode_count"] >= 1
    assert report["dfreq_vs_postings"] >= 1  # dfreq still has the old sums


def test_truncated_bytes_flagged_not_fatal(spark, built_index, tmp_path):
    """Chop bytes off one term's tf stream: the deep tier must REPORT the
    corruption (decode_error + count shortfall), never kill the job."""
    d = _copy(built_index, tmp_path)
    _rewrite(
        spark, f"{d}/postings",
        lambda p: p.withColumn(
            "tfs",
            F.when(
                F.col("term") == p.select("term").first()["term"],
                F.expr("substring(tfs, 1, greatest(length(tfs) - 2, 0))"),
            ).otherwise(F.col("tfs")),
        ),
        partition_by="bucket", base_path=True,
    )
    report = validate_index(spark, d, N_BUCKETS, deep=True)
    assert report["decode_error"] >= 1
    assert report["decode_count"] >= 1
    assert report["df_vs_blocks"] == 0  # metadata arrays untouched


def test_dropped_doc_flagged(spark, built_index, tmp_path):
    d = _copy(built_index, tmp_path)
    victim = spark.read.parquet(f"{d}/docs").select("doc_id").first()["doc_id"]
    _rewrite(spark, f"{d}/docs", lambda docs: docs.filter(F.col("doc_id") != victim))
    report = validate_index(spark, d, N_BUCKETS, deep=True)
    assert report["stats_vs_docs"] == 1
    assert report["orphan_postings"] >= 1


def test_duplicate_doc_flagged(spark, built_index, tmp_path):
    d = _copy(built_index, tmp_path)
    _rewrite(spark, f"{d}/docs", lambda docs: docs.unionByName(docs.limit(1)))
    report = validate_index(spark, d, N_BUCKETS)
    assert report["docs_unique"] == 1
    assert report["stats_vs_docs"] == 1


def test_bucket_key_mismatch_flagged(spark, built_index, tmp_path):
    d = _copy(built_index, tmp_path)
    _rewrite(
        spark, f"{d}/postings",
        lambda p: p.withColumn(
            "bucket", F.pmod(F.col("bucket") + 1, F.lit(N_BUCKETS)).cast("int")
        ),
        partition_by="bucket", base_path=True,
    )
    report = validate_index(spark, d, N_BUCKETS)
    assert report["bucket_key"] >= 1


# --------------------- tiered-LSM and embedding-index validation (r5)

def test_tiered_index_validates_including_segments(spark, small_corpus, tmp_path):
    """Main + one immutable segment + live delta, with a re-crawled doc
    whose latest version lives ONLY in the segment tier: structural and
    deep checks span tiers in one scan; the orphan check resolves decoded
    ids against main ∪ segment docs. Then corrupt the SEGMENT's postings
    and require the same checks to see it."""
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        minor_compact,
        start_incremental_index,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2))
    part0, part1 = base.filter(h == 0), base.filter(h == 1)
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_buckets=N_BUCKETS, hot_df_threshold=100,
                 n_shards=4).build(part0)

    # one re-crawl (same natural key, new content) + brand-new docs
    r = part0.first()
    upd = spark.createDataFrame(
        [(r["repo"], r["path"], r["commit"], r["lang"],
          "recrawl marker " + r["content"][:40])],
        "repo string, path string, commit string, lang string, content string",
    )
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    part1.unionByName(upd).write.parquet(f"{inbox}/b1")
    q = start_incremental_index(spark, f"{inbox}/b*", idx, ckpt)
    q.awaitTermination(120)
    minor_compact(spark, idx, n_buckets=N_BUCKETS, hot_df_threshold=100,
                  n_shards=4)

    report = validate_index(spark, idx, N_BUCKETS, deep=True)
    assert is_clean(report), report
    assert "segment_docs_unique" in report  # the segment tier was seen

    # corrupting only the segment's postings must be visible
    d = _copy(idx, tmp_path)
    seg_post = f"{d}/segments/postings"
    _rewrite(spark, seg_post,
             lambda p: p.withColumn("df", F.col("df") + 1),
             partition_by=("seg", "bucket"), base_path=True)
    report = validate_index(spark, d, N_BUCKETS, deep=True)
    assert report["df_vs_blocks"] >= 1
    assert report["decode_count"] >= 1
    # main postings untouched: dfreq (main-only) stays clean
    assert report["dfreq_vs_postings"] == 0


def test_embedding_index_validates_and_flags(spark, tmp_path):
    from search_engine_core_spark.sources.embedding_index import (
        EmbeddingIndexBuilder,
    )
    from search_engine_core_spark.sources.validate import (
        validate_embedding_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = str(tmp_path / "eidx")
    b = EmbeddingIndexBuilder(spark, d, n_bits=4, n_centroids=4,
                              centroid_ids=[1, 2, 3, 4], partition_cells=False)
    b.build(emb.select("vec_id", "embedding"))
    b.add_pq(m=8, n_bits=6, seed=9, sample_n=400)

    report = validate_embedding_index(spark, d, deep=True)
    assert is_clean(report), report
    assert set(report) == {"meta_n_vecs", "vec_id_unique", "pq_alignment",
                           "assignment_key", "pq_codes"}

    # stale partition key: vectors moved to the wrong bucket dir
    c1 = _copy(d, tmp_path / "a")
    _rewrite(spark, f"{c1}/vectors",
             lambda v: v.withColumn(
                 "bucket", F.pmod(F.col("bucket") + 1, F.lit(16)).cast("int")),
             partition_by="bucket", base_path=True)
    r1 = validate_embedding_index(spark, c1, deep=True)
    assert r1["assignment_key"] >= 1

    # codes sidecar drift: one code row dropped + the rest re-written
    c2 = _copy(d, tmp_path / "b")
    victim = spark.read.parquet(f"{c2}/pq").first()["vec_id"]
    _rewrite(spark, f"{c2}/pq",
             lambda p: p.filter(F.col("vec_id") != victim),
             partition_by="bucket", base_path=True)
    r2 = validate_embedding_index(spark, c2, deep=True)
    assert r2["pq_alignment"] >= 1 and r2["pq_codes"] >= 1
