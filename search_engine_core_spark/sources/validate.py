"""Distributed index integrity validation.

A 100 TB index is written by thousands of tasks across retries, resumes,
deletes, upserts and compactions; silent corruption (a half-scrubbed
delete, a dfreq row that drifted from its postings, a block header that
disagrees with its payload) surfaces as WRONG QUERY RESULTS, not as a
crash. This module makes every structural invariant of the index format
(``operators/postings.py``) checkable as a handful of Spark
aggregations — no driver-side decode, no collect beyond per-check
violation counts — so an operator can run it after any lifecycle
operation and before promoting an index to serving.

Checks (each one scan or one join, all pushdown-friendly):

structural (postings table only, pure Catalyst expressions):
  * ``df_vs_blocks``      — declared df == sum(block_n)
  * ``block_align``       — the six per-block arrays have equal length
  * ``block_order``       — block_first <= block_last, blocks strictly
                            increasing and non-overlapping across the row
  * ``max_tf_vs_blocks``  — max_tf == max(block_max_tf)
  * ``bucket_key``        — partition dir == xxhash64-derived term bucket
cross-table:
  * ``dfreq_vs_postings`` — dfreq.df == sum of shard dfs per term (both
                            directions: missing terms count too)
  * ``stats_vs_docs``     — stats.n_docs == count(docs), avgdl matches
  * ``docs_unique``       — doc_id unique in docs
deep (opt-in: decodes postings via the Arrow batch decoder):
  * ``decode_count``      — decoded rows per (term, shard) == df
  * ``decode_tf``         — every decoded tf in [1, max_tf]
  * ``orphan_postings``   — decoded doc_ids all exist in docs (catches a
                            delete that scrubbed docs but missed a bucket)

The reference engine trusts Redis/Mongo for storage consistency
(``src/storage/RedisSearchStorage.cpp`` operates on live structures); a
file-based LSM index has no such referee, so this validator is the
self-check a production deployment runs where the reference would rely
on its database. Returns {check: violation_count}; all zeros == clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _count(df: DataFrame) -> int:
    return df.count()


def validate_index(
    spark: SparkSession,
    index_dir: str,
    n_buckets: int = 16,
    deep: bool = False,
    include_segments: bool = True,
) -> dict[str, int]:
    """Run all integrity checks; see module docstring. ``deep=True`` adds
    the decode-path checks (costs one full postings decode — still
    distributed, but proportional to index size; the structural tier is
    metadata-arrays only and prunes to row-group stats where possible).

    ``include_segments``: on a tiered LSM index
    (``streaming/incremental.py``), the structural + deep checks also
    cover every immutable segment's postings in the SAME scan (the
    segment layout nests bucket under seg, so one basePath read carries
    both), the orphan check resolves decoded doc_ids against main ∪
    segment docs (a re-crawled doc may live only in a newer tier), and
    ``segment_docs_unique`` asserts per-segment doc_id uniqueness
    (cross-segment repeats are LEGAL — that's latest-wins). The dfreq
    and stats cross-checks stay main-only by design: tier-union term
    stats are a query-time upper-bound contract, not a stored table."""
    import os

    post = spark.read.option("basePath", f"{index_dir}/postings").parquet(
        f"{index_dir}/postings"
    )
    docs = spark.read.parquet(f"{index_dir}/docs")
    dfreq = spark.read.parquet(f"{index_dir}/dfreq")
    stats = spark.read.parquet(f"{index_dir}/stats")

    out: dict[str, int] = {}

    main_post = post  # dfreq cross-check is main-only (see docstring)
    seg_root = f"{index_dir}/segments/postings"
    docs_universe = docs.select("doc_id")
    # an interrupted merge_segments swap: the inflight marker means the
    # segment tree is mid-transition — recover_merge() rolls it forward
    out["merge_inflight"] = int(
        os.path.exists(f"{index_dir}/segments/_merge_inflight.json")
    )
    if include_segments and os.path.isdir(seg_root):
        seg_post = spark.read.option("basePath", seg_root).parquet(seg_root)
        post = post.unionByName(seg_post.drop("seg"))
        seg_docs_root = f"{index_dir}/segments/docs"
        if os.path.isdir(seg_docs_root):
            seg_docs = spark.read.option("basePath", seg_docs_root).parquet(
                seg_docs_root
            )
            docs_universe = docs_universe.unionByName(
                seg_docs.select("doc_id")
            ).distinct()
            out["segment_docs_unique"] = _count(
                seg_docs.groupBy("seg", "doc_id").count().filter(F.col("count") > 1)
            )

    # -- structural ------------------------------------------------------
    out["df_vs_blocks"] = _count(
        post.filter(
            F.aggregate("block_n", F.lit(0).cast("long"), lambda a, x: a + x)
            != F.col("df")
        )
    )
    sizes = [F.size(c) for c in (
        "block_first", "block_last", "block_n",
        "block_gap_off", "block_tf_off", "block_max_tf",
    )]
    misaligned = None
    for s in sizes[1:]:
        bad = s != sizes[0]
        misaligned = bad if misaligned is None else (misaligned | bad)
    out["block_align"] = _count(post.filter(misaligned))

    # within a row: first <= last per block, and block i+1 starts after
    # block i ends (zip the last array against the first array shifted
    # left by one; slice() is 1-indexed)
    intra = F.exists(
        F.zip_with("block_first", "block_last", lambda a, b: a > b),
        lambda x: x,
    )
    overlap = F.when(
        F.size("block_first") > 1,
        F.exists(
            F.zip_with(
                F.slice("block_first", 2, F.greatest(F.size("block_first") - 1, F.lit(1))),
                F.slice("block_last", 1, F.greatest(F.size("block_last") - 1, F.lit(1))),
                lambda nxt_first, prev_last: nxt_first <= prev_last,
            ),
            lambda x: x,
        ),
    ).otherwise(F.lit(False))
    out["block_order"] = _count(post.filter(intra | overlap))

    out["max_tf_vs_blocks"] = _count(
        post.filter(F.array_max("block_max_tf") != F.col("max_tf"))
    )
    out["bucket_key"] = _count(
        post.filter(
            F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets)) != F.col("bucket")
        )
    )

    # -- cross-table -----------------------------------------------------
    agg = main_post.groupBy("term").agg(F.sum("df").alias("post_df"))
    out["dfreq_vs_postings"] = _count(
        agg.join(dfreq.select("term", "df"), "term", "full_outer").filter(
            F.col("post_df").isNull()
            | F.col("df").isNull()
            | (F.col("post_df") != F.col("df"))
        )
    )
    srow = stats.collect()[0]
    dstats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl")
    ).collect()[0]
    out["stats_vs_docs"] = int(
        int(srow["n_docs"]) != int(dstats["n"])
        or abs(float(srow["avgdl"]) - float(dstats["avgdl"] or 0.0)) > 1e-6
    )
    out["docs_unique"] = _count(
        docs.groupBy("doc_id").count().filter(F.col("count") > 1)
    )

    # -- deep ------------------------------------------------------------
    if deep:
        decoded = _tolerant_decode(post)
        ok = decoded.filter(F.col("decode_error") == 0)
        out["decode_error"] = _count(
            decoded.filter(F.col("decode_error") == 1)
            .select("term", "shard").distinct()
        )
        # left join (not groupBy of ok rows alone): a list whose decode
        # errored out — or decoded to zero rows — must still show up as a
        # count mismatch against its declared df
        counts = ok.groupBy("term", "shard").agg(F.count(F.lit(1)).alias("n"))
        out["decode_count"] = _count(
            post.groupBy("term", "shard")
            .agg(F.sum("df").alias("df"))
            .join(counts, ["term", "shard"], "left")
            .filter(F.coalesce(F.col("n"), F.lit(0)) != F.col("df"))
        )
        out["decode_tf"] = _count(
            ok.filter((F.col("tf") < 1) | (F.col("tf") > F.col("max_tf")))
        )
        out["orphan_postings"] = _count(
            ok.select("doc_id")
            .distinct()
            .join(docs_universe, "doc_id", "left_anti")
        )

    return out


def validate_embedding_index(
    spark: SparkSession, index_dir: str, deep: bool = False
) -> dict[str, int]:
    """Integrity checks for the materialized embedding index
    (``sources/embedding_index.py``) and its optional PQ codes sidecar.

    shallow:
      * ``meta_n_vecs``   — meta.json count == count(vectors)
      * ``vec_id_unique`` — no duplicate vectors (an upsert bug's symptom)
      * ``pq_alignment``  — codes ids == vector ids (full outer), and
                            every code is exactly m bytes
    deep (recomputes assignments / encodings with the STORED sidecars):
      * ``assignment_key`` — stored (bucket, cell) == re-assignment under
                             the stored hyperplanes/centroids (a probe
                             that prunes on a stale key silently loses
                             recall; this is the check that catches it)
      * ``pq_codes``       — stored codes byte-equal a re-encode under
                             the stored codebooks
    """
    import json as _json
    import os

    from search_engine_core_spark.sources.embedding_index import (
        _ASSIGNED_SCHEMA,
        _assign_arrow,
    )

    with open(f"{index_dir}/meta.json") as f:
        meta = _json.load(f)
    vecs = spark.read.option("basePath", f"{index_dir}/vectors").parquet(
        f"{index_dir}/vectors"
    )
    out: dict[str, int] = {}
    n = vecs.count()
    out["meta_n_vecs"] = int(int(meta["n_vecs"]) != n)
    out["vec_id_unique"] = _count(
        vecs.groupBy("vec_id").count().filter(F.col("count") > 1)
    )

    pq_meta_path = f"{index_dir}/pq_meta.json"
    has_pq = os.path.exists(pq_meta_path)
    if has_pq:
        with open(pq_meta_path) as f:
            pm = _json.load(f)
        codes = spark.read.option("basePath", f"{index_dir}/pq").parquet(
            f"{index_dir}/pq"
        )
        out["pq_alignment"] = _count(
            vecs.select("vec_id")
            .join(
                codes.select("vec_id", F.length("code").alias("code_len")),
                "vec_id",
                "full_outer",
            )
            .filter(
                F.col("code_len").isNull() | (F.col("code_len") != int(pm["m"]))
            )
        )

    if deep:
        stored = vecs.select(
            "vec_id", "embedding",
            F.col("bucket").alias("stored_bucket"),
            F.col("cell").alias("stored_cell"),
        )
        reassigned = stored.mapInPandas(
            _assign_arrow(meta["hyperplanes"], meta["centroids"], "embedding"),
            "vec_id long, embedding array<float>, stored_bucket int, "
            "stored_cell int, bucket int, cell int",
        )
        out["assignment_key"] = _count(
            reassigned.filter(
                (F.col("bucket") != F.col("stored_bucket"))
                | (F.col("cell") != F.col("stored_cell"))
            )
        )
        if has_pq:
            import numpy as np

            from search_engine_core_spark.operators.pq import encode_pq

            books = np.asarray(pm["codebooks"], dtype=np.float64)
            fresh = encode_pq(vecs, books).select(
                "vec_id", F.col("code").alias("fresh_code")
            )
            out["pq_codes"] = _count(
                codes.select("vec_id", "code")
                .join(fresh, "vec_id", "full_outer")
                .filter(
                    F.col("code").isNull()
                    | F.col("fresh_code").isNull()
                    | (F.col("code") != F.col("fresh_code"))
                )
            )

    return out


def _tolerant_decode(post: DataFrame) -> DataFrame:
    """Decode every posting list, isolating corruption to the list that
    carries it: a list whose byte stream is truncated/inconsistent yields
    ONE row with decode_error=1 instead of killing the task (the
    production decoder — ``decode_postings_df`` — correctly refuses such
    streams outright; a validator's job is to count them). The decode
    unit is the posting LIST (vectorized numpy within each), not the
    entry — this is the one deliberately per-list Python loop in the
    package, confined to the opt-in deep tier."""
    import pandas as pd

    from search_engine_core_spark.operators.postings import decode_postings_row

    def gen(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                base = {"term": row["term"], "shard": row["shard"],
                        "max_tf": row["max_tf"]}
                try:
                    ids, tfs = decode_postings_row(row)
                    frames.append(pd.DataFrame({
                        **base,
                        "doc_id": ids.astype("int64"),
                        "tf": tfs.astype("int64"),
                        "decode_error": 0,
                    }))
                except Exception:
                    frames.append(pd.DataFrame({
                        **base, "doc_id": [None], "tf": [None],
                        "decode_error": [1],
                    }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return post.mapInPandas(
        gen,
        "term string, shard int, max_tf int, doc_id long, tf long, decode_error int",
    )


def is_clean(report: dict[str, int]) -> bool:
    return all(v == 0 for v in report.values())


def main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m search_engine_core_spark.sources.validate
    <index_dir> [--n-buckets N] [--deep]`` — prints one JSON report line,
    exit 0 clean / 1 violations."""
    import argparse
    import json

    from search_engine_core_spark.session import get_spark

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("index_dir")
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--deep", action="store_true")
    p.add_argument("--embedding", action="store_true",
                   help="validate an embedding index instead of a text index")
    args = p.parse_args(argv)
    spark = get_spark("validate_index")
    if args.embedding:
        report = validate_embedding_index(spark, args.index_dir, deep=args.deep)
    else:
        report = validate_index(spark, args.index_dir, args.n_buckets, deep=args.deep)
    print(json.dumps({"index_dir": args.index_dir, "clean": is_clean(report),
                      "violations": report}))
    return 0 if is_clean(report) else 1


if __name__ == "__main__":
    raise SystemExit(main())
