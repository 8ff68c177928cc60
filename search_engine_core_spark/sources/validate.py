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
) -> dict[str, int]:
    """Run all integrity checks; see module docstring. ``deep=True`` adds
    the decode-path checks (costs one full postings decode — still
    distributed, but proportional to index size; the structural tier is
    metadata-arrays only and prunes to row-group stats where possible)."""
    post = spark.read.option("basePath", f"{index_dir}/postings").parquet(
        f"{index_dir}/postings"
    )
    docs = spark.read.parquet(f"{index_dir}/docs")
    dfreq = spark.read.parquet(f"{index_dir}/dfreq")
    stats = spark.read.parquet(f"{index_dir}/stats")

    out: dict[str, int] = {}

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
    agg = post.groupBy("term").agg(F.sum("df").alias("post_df"))
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
            .join(docs.select("doc_id"), "doc_id", "left_anti")
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
    args = p.parse_args(argv)
    spark = get_spark("validate_index")
    report = validate_index(spark, args.index_dir, args.n_buckets, deep=args.deep)
    print(json.dumps({"index_dir": args.index_dir, "clean": is_clean(report),
                      "violations": report}))
    return 0 if is_clean(report) else 1


if __name__ == "__main__":
    raise SystemExit(main())
