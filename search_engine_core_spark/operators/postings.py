"""Posting-list construction: salted shuffle -> blocked, compressed lists.

The build pipeline (north rule core):

  (doc_id, term, tf) triples
    -> salt: hot terms (df > threshold) get shard = pmod(xxhash64(doc_id), R)
       so no single reducer ever materializes a full hot-term posting list
       (a term like "return" has df ~= N; at 10^12 files that is ~10^11
       entries — it MUST stay sharded, which is why hot terms are stored as
       R independent index rows rather than re-merged onto one task)
    -> groupBy(term, shard).applyInPandas(encode): sort doc_ids, split into
       blocks of 128, delta-gap within block, varbyte both gaps and tfs,
       per-block metadata (first/last doc_id, byte offsets, max tf) so
       query-time can skip whole blocks byte-precisely (block-max WAND)
    -> rows (term, shard, df, max_tf, block_* arrays, doc_gaps, tfs)

Cold terms always get shard 0 and exactly one row, so a salted build and an
unsalted build are byte-identical outside the hot set (tested).

Shard independence is safe because BM25 scoring joins on doc_id — shards
partition the doc space per term, and block metadata stays valid per shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.varbyte import (
    encode_doc_gaps,
    unbias,
    vb_decode,
    vb_encode,
)

BLOCK = 128

POSTINGS_SCHEMA = (
    "term string, shard int, df long, max_tf int, "
    "block_first array<long>, block_last array<long>, block_n array<int>, "
    "block_gap_off array<int>, block_tf_off array<int>, block_max_tf array<int>, "
    "doc_gaps binary, tfs binary"
)


def _encode_one(doc_ids: np.ndarray, tfs: np.ndarray) -> dict:
    """Encode ONE already-sorted (term, shard) posting list. Pure numpy."""
    n = doc_ids.size
    starts = np.arange(0, n, BLOCK)
    ends = np.minimum(starts + BLOCK, n)
    _, gaps = encode_doc_gaps(doc_ids)
    gap_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    gap_offs = np.zeros(starts.size, dtype=np.int64)
    tf_offs = np.zeros(starts.size, dtype=np.int64)
    block_max_tf = np.zeros(starts.size, dtype=np.int64)
    gpos = tpos = 0
    for bi, (s, e) in enumerate(zip(starts, ends)):
        gap_offs[bi], tf_offs[bi] = gpos, tpos
        # within-block gaps exclude the first element (stored in block_first)
        gb = vb_encode(gaps[s + 1 : e] if e > s + 1 else np.empty(0, np.uint64))
        tb = vb_encode(tfs[s:e])
        gap_chunks.append(gb)
        tf_chunks.append(tb)
        gpos += len(gb)
        tpos += len(tb)
        block_max_tf[bi] = int(tfs[s:e].max())
    return {
        "df": n,
        "max_tf": int(tfs.max()),
        "block_first": doc_ids[starts].tolist(),
        "block_last": doc_ids[ends - 1].tolist(),
        "block_n": (ends - starts).tolist(),
        "block_gap_off": gap_offs.tolist(),
        "block_tf_off": tf_offs.tolist(),
        "block_max_tf": block_max_tf.tolist(),
        "doc_gaps": b"".join(gap_chunks),
        "tfs": b"".join(tf_chunks),
    }


def _encode_chunk(pdf: pd.DataFrame, with_bucket: bool) -> pd.DataFrame:
    """Encode a sorted (term, shard, doc_id) chunk holding >=1 complete
    groups. Group boundaries found vectorized; per-group work is numpy
    slicing — no pandas dispatch per group (that costs ~100µs x millions
    of distinct terms at scale)."""
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy().astype(np.int64)
    tfs = pdf["tf"].to_numpy().astype(np.uint64)
    new_group = np.empty(len(pdf), dtype=bool)
    new_group[0] = True
    new_group[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
    starts = np.flatnonzero(new_group)
    ends = np.append(starts[1:], len(pdf))
    rows = []
    buckets = pdf["bucket"].to_numpy() if with_bucket else None
    for s, e in zip(starts, ends):
        enc = _encode_one(doc_ids[s:e], tfs[s:e])
        enc["term"] = terms[s]
        enc["shard"] = int(shards[s])
        if with_bucket:
            enc["bucket"] = int(buckets[s])
        rows.append(enc)
    cols = (["bucket"] if with_bucket else []) + [
        "term", "shard", "df", "max_tf", "block_first", "block_last", "block_n",
        "block_gap_off", "block_tf_off", "block_max_tf", "doc_gaps", "tfs",
    ]
    return pd.DataFrame(rows, columns=cols)


def _encode_partition(batches, with_bucket: bool):
    """mapInPandas over a partition sorted by (term, shard, doc_id): emit
    one row per complete group, carrying the trailing incomplete group
    into the next Arrow batch (groups may span batch boundaries)."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if pdf.empty:
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        last_term = pdf["term"].iloc[-1]
        last_shard = pdf["shard"].iloc[-1]
        tail_mask = (pdf["term"] == last_term) & (pdf["shard"] == last_shard)
        # sorted input => the last group is a contiguous suffix
        tail_start = len(pdf) - int(tail_mask.sum())
        head = pdf.iloc[:tail_start]
        carry = pdf.iloc[tail_start:]
        if len(head):
            yield _encode_chunk(head, with_bucket)
    if carry is not None and len(carry):
        yield _encode_chunk(carry, with_bucket)


def decode_postings_row(
    row: dict, block_mask: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Postings row -> (doc_ids int64, tfs uint64). ``block_mask`` selects
    blocks (block-max skipping): unselected blocks are never byte-decoded."""
    bf = np.asarray(row["block_first"], dtype=np.int64)
    bn = np.asarray(row["block_n"], dtype=np.int64)
    go = np.asarray(row["block_gap_off"], dtype=np.int64)
    to = np.asarray(row["block_tf_off"], dtype=np.int64)
    gaps_buf, tfs_buf = row["doc_gaps"], row["tfs"]
    idx = np.flatnonzero(block_mask) if block_mask is not None else np.arange(bf.size)
    out_ids: list[np.ndarray] = []
    out_tfs: list[np.ndarray] = []
    for bi in idx:
        n = int(bn[bi])
        gaps = vb_decode(gaps_buf, offset=int(go[bi]), count=n - 1)
        # bias via array ops so int64->uint64 wraparound stays silent/exact
        first = (bf[bi : bi + 1].astype(np.uint64) + np.uint64(1 << 63))[0]
        u = np.empty(n, dtype=np.uint64)
        u[0] = first
        if n > 1:
            u[1:] = first + np.cumsum(gaps, dtype=np.uint64)
        out_ids.append(unbias(u))
        out_tfs.append(vb_decode(tfs_buf, offset=int(to[bi]), count=n))
    if not out_ids:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    return np.concatenate(out_ids), np.concatenate(out_tfs)


def build_postings(
    trip: DataFrame,
    dfreq: DataFrame,
    hot_df_threshold: int = 100_000,
    n_shards: int = 8,
    bucket_col: bool = False,
    hot_is_term_set: bool = False,
) -> DataFrame:
    """triples + df-stats -> compressed postings rows.

    Hot-term detection is a broadcast join against the (tiny) hot subset of
    the df table — the full df table never ships. The groupBy(term, shard)
    is THE big shuffle of the build; salting bounds every task at
    ~df/n_shards entries for hot terms.
    """
    if hot_is_term_set:
        # caller supplies the hot-term set directly (e.g. sample-estimated)
        hot = dfreq.select("term").withColumn("_hot", F.lit(True))
    else:
        hot = dfreq.filter(F.col("df") > hot_df_threshold).select("term").withColumn(
            "_hot", F.lit(True)
        )
    salted = (
        trip.join(F.broadcast(hot), "term", "left")
        .withColumn(
            "shard",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    schema = ("bucket int, " + POSTINGS_SCHEMA) if bucket_col else POSTINGS_SCHEMA
    cols = ["term", "shard", "doc_id", "tf"] + (["bucket"] if bucket_col else [])
    # JVM-side shuffle + Tungsten sort groups each (term, shard) run
    # contiguously; the Arrow mapInPandas then encodes whole batches with
    # numpy group-splitting — no per-group pandas dispatch (the naive
    # groupBy().applyInPandas() pays ~100µs per distinct term, which at
    # millions of code-identifier terms dominates the build).
    # EXPLICIT partition count: without it AQE coalesces this exchange to
    # ~64MB partitions — but the downstream stage is CPU-bound Python
    # encode, not IO-bound, so coalescing starves the executor cores
    # (observed: bimodal 2-3x slowdowns when AQE picked 4 of 16 slots).
    sess = trip.sparkSession
    n_part = max(
        sess.sparkContext.defaultParallelism,
        int(sess.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    arranged = (
        salted.select(*cols)
        .repartition(n_part, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
    )
    return arranged.mapInPandas(lambda it: _encode_partition(it, bucket_col), schema)


def decode_postings_df(postings: DataFrame) -> DataFrame:
    """Postings rows -> (doc_id, term, tf) triples via Arrow mapInPandas —
    the inverse of build_postings; used by the materialized query path and
    the salted-vs-unsalted equivalence test."""

    def gen(batches):
        for pdf in batches:
            ids_all: list[np.ndarray] = []
            tfs_all: list[np.ndarray] = []
            terms_all: list[np.ndarray] = []
            for row in pdf.to_dict("records"):
                ids, tfs = decode_postings_row(row)
                ids_all.append(ids)
                tfs_all.append(tfs.astype(np.int64))
                terms_all.append(np.repeat(row["term"], ids.size))
            if not ids_all:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids_all),
                    "term": np.concatenate(terms_all),
                    "tf": np.concatenate(tfs_all),
                }
            )

    return postings.mapInPandas(gen, "doc_id long, term string, tf long")
