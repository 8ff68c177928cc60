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
    vb_encode_with_sizes,
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


def _encode_chunk_arrow(tbl, with_bucket: bool):
    """Encode an Arrow table (sorted by term, shard, doc_id) holding >=1
    complete groups — ZERO per-group Python.

    Two earlier generations of this operator were too slow at scale:
    groupBy().applyInPandas() pays ~100µs pandas dispatch per group, and a
    per-group numpy loop still pays ~150µs of small-array overhead per
    group — fatal when code corpora have millions of distinct identifier
    terms. This version is fully segmented-vectorized: group/block
    boundaries via flatnonzero, per-block stats via maximum.reduceat, ONE
    varbyte encode over the whole chunk's gap/tf streams with per-value
    sizes, byte offsets via cumsum algebra, and zero-copy Arrow
    list/binary construction. Strings never materialize as PyObjects
    (Arrow take() only at group starts).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    terms = tbl.column("term").combine_chunks()
    shards = tbl.column("shard").to_numpy()
    doc_ids = tbl.column("doc_id").to_numpy().astype(np.int64)
    buckets = tbl.column("bucket").to_numpy() if with_bucket else None
    # group boundary: term[i] != term[i-1] or shard changed — vectorized
    # string compare in Arrow C++
    if n > 1:
        term_change = pc.not_equal(terms.slice(1), terms.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    else:
        term_change = np.empty(0, dtype=bool)
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = term_change | (shards[1:] != shards[:-1])

    if "tf" in tbl.schema.names:
        tfs_i = tbl.column("tf").to_numpy().astype(np.int64)
    else:
        # RAW-OCCURRENCE input (one row per token occurrence): tf is the
        # run length of equal (term, shard, doc_id) rows. Doing this here
        # — after the one (term, shard) shuffle, on already-sorted data —
        # removes the upstream groupBy(doc_id, term) hash aggregation,
        # which at 2M docs was a 205M-string-key exchange + spill and the
        # single most expensive stage of the whole build.
        run_start = new_group.copy()
        run_start[1:] |= doc_ids[1:] != doc_ids[:-1]
        run_idx = np.flatnonzero(run_start)
        tfs_i = np.diff(np.append(run_idx, n)).astype(np.int64)
        doc_ids = doc_ids[run_idx]
        shards = shards[run_idx]
        new_group = new_group[run_idx]
        terms = pc.take(terms, pa.array(run_idx))
        if buckets is not None:
            buckets = buckets[run_idx]
        n = run_idx.size

    starts = np.flatnonzero(new_group)
    n_groups = starts.size
    ends = np.append(starts[1:], n)

    # ---- block segmentation (block = 128 rows within a group) ----
    group_id = np.cumsum(new_group) - 1
    pos_in_group = np.arange(n, dtype=np.int64) - starts[group_id]
    is_block_start = (pos_in_group % BLOCK) == 0
    block_starts = np.flatnonzero(is_block_start)
    block_ends = np.append(block_starts[1:], n)  # group starts are block
    block_group = group_id[block_starts]  # starts, so no block spans groups
    blocks_per_group = np.bincount(block_group, minlength=n_groups)

    # ---- doc-gap stream: within-block deltas, block-first stored apart --
    u = doc_ids.astype(np.uint64) + np.uint64(1 << 63)
    gaps_all = np.empty(n, dtype=np.uint64)
    gaps_all[0] = 0
    gaps_all[1:] = u[1:] - u[:-1]
    gap_mask = ~is_block_start
    gap_bytes, gap_sizes = vb_encode_with_sizes(gaps_all[gap_mask])
    row_gap_len = np.zeros(n, dtype=np.int64)
    row_gap_len[gap_mask] = gap_sizes
    csum_gap = np.concatenate(([0], np.cumsum(row_gap_len)))  # byte pos BEFORE row i
    group_gap_start = csum_gap[starts]
    block_gap_off = csum_gap[block_starts] - group_gap_start[block_group]
    group_gap_len = np.append(group_gap_start[1:], csum_gap[n]) - group_gap_start

    # ---- tf stream: every row contributes ----
    tf_bytes, tf_sizes = vb_encode_with_sizes(tfs_i.astype(np.uint64))
    csum_tf = np.concatenate(([0], np.cumsum(tf_sizes)))
    group_tf_start = csum_tf[starts]
    block_tf_off = csum_tf[block_starts] - group_tf_start[block_group]
    group_tf_len = np.append(group_tf_start[1:], csum_tf[n]) - group_tf_start

    # ---- per-block / per-group stats ----
    block_first = doc_ids[block_starts]
    block_last = doc_ids[block_ends - 1]
    block_n = block_ends - block_starts
    block_max_tf = np.maximum.reduceat(tfs_i, block_starts)
    df = ends - starts
    max_tf = np.maximum.reduceat(tfs_i, starts)

    # ---- zero-copy Arrow assembly ----
    def list_arr(values: np.ndarray, dtype):
        off = np.concatenate(([0], np.cumsum(blocks_per_group))).astype(np.int32)
        return pa.ListArray.from_arrays(pa.array(off), pa.array(values.astype(dtype)))

    def bin_arr(buf: bytes, lens: np.ndarray):
        off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        return pa.Array.from_buffers(
            pa.binary(), n_groups, [None, pa.py_buffer(off.tobytes()), pa.py_buffer(buf)]
        )

    cols = {
        "term": pc.take(terms, pa.array(starts)),
        "shard": pa.array(shards[starts].astype(np.int32)),
        "df": pa.array(df.astype(np.int64)),
        "max_tf": pa.array(max_tf.astype(np.int32)),
        "block_first": list_arr(block_first, np.int64),
        "block_last": list_arr(block_last, np.int64),
        "block_n": list_arr(block_n, np.int32),
        "block_gap_off": list_arr(block_gap_off, np.int32),
        "block_tf_off": list_arr(block_tf_off, np.int32),
        "block_max_tf": list_arr(block_max_tf, np.int32),
        "doc_gaps": bin_arr(gap_bytes, group_gap_len),
        "tfs": bin_arr(tf_bytes, group_tf_len),
    }
    if with_bucket:
        cols = {"bucket": pa.array(buckets[starts].astype(np.int32)), **cols}
    return pa.RecordBatch.from_arrays(list(cols.values()), names=list(cols.keys()))


def _arrow_schema(with_bucket: bool):
    import pyarrow as pa

    fields = ([("bucket", pa.int32())] if with_bucket else []) + [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("df", pa.int64()),
        ("max_tf", pa.int32()),
        ("block_first", pa.list_(pa.int64())),
        ("block_last", pa.list_(pa.int64())),
        ("block_n", pa.list_(pa.int32())),
        ("block_gap_off", pa.list_(pa.int32())),
        ("block_tf_off", pa.list_(pa.int32())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("doc_gaps", pa.binary()),
        ("tfs", pa.binary()),
    ]
    return pa.schema(fields)


def _encode_partition(batches, with_bucket: bool):
    """mapInArrow over a partition sorted by (term, shard, doc_id): emit
    one row per complete group, carrying the trailing incomplete group
    into the next Arrow batch (groups may span batch boundaries)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        pa.set_cpu_count(1)  # one task slot = one core (strong-scaling honesty)
    except Exception:
        pass
    carry = None  # pyarrow.Table of the last (possibly incomplete) group
    for batch in batches:
        if batch.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([batch])
        if carry is not None:
            tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            carry = None
        n = tbl.num_rows
        terms = tbl.column("term")
        shards = tbl.column("shard")
        last_term = terms[n - 1]
        last_shard = shards[n - 1]
        # sorted input => the last group is a contiguous suffix; find its
        # start by scanning the equality mask from the end (vectorized)
        eq = pc.and_(
            pc.equal(terms, last_term), pc.equal(shards, last_shard)
        ).to_numpy(zero_copy_only=False)
        tail_len = int(eq[::-1].argmin()) if not eq.all() else n
        tail_start = n - tail_len
        head = tbl.slice(0, tail_start)
        carry = tbl.slice(tail_start)
        if head.num_rows:
            yield _encode_chunk_arrow(head, with_bucket)
    if carry is not None and carry.num_rows:
        yield _encode_chunk_arrow(carry, with_bucket)


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
    n_partitions: int | None = None,
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
    # ``trip`` may be pre-aggregated (doc_id, term, tf) OR raw occurrences
    # (doc_id, term — one row per token): the encoder run-length-counts tf
    # itself on raw input, avoiding the giant groupBy(doc_id, term) agg.
    cols = ["term", "shard", "doc_id"] + (["tf"] if "tf" in trip.columns else []) + (
        ["bucket"] if bucket_col else []
    )
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
    # over-partition 4x: per-task sort runs must fit execution memory or
    # Tungsten spills to disk with multi-pass merges (measured: the sort
    # of raw occurrences was THE build bottleneck when partitions were
    # sized 1:1 with cores). AQE won't coalesce an explicit repartition.
    # ``n_partitions`` pins the exchange width explicitly (strong-scaling
    # runs need the IDENTICAL plan at every cluster size); default derives
    # from the session.
    n_part = n_partitions or max(
        4 * sess.sparkContext.defaultParallelism,
        int(sess.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    # Sort on xxhash64(term), not the string: Tungsten's radix sort uses an
    # 8-byte prefix, and short code-identifier terms share prefixes, forcing
    # full comparator calls (measured 3x the whole shuffle cost). An int64
    # key keeps the sort pure radix. A hash collision merely interleaves
    # two terms in one partition range — the encoder's term-change boundary
    # then emits fragmented (but individually valid, doc-sorted) rows for
    # each, which readers already handle exactly like shards.
    arranged = (
        salted.select(*cols, F.xxhash64("term").alias("_tid"))
        .repartition(n_part, "_tid", "shard")
        .sortWithinPartitions("_tid", "shard", "doc_id")
        .drop("_tid")
    )
    return arranged.mapInArrow(lambda it: _encode_partition(it, bucket_col), schema)


def _decode_chunk(pdf: pd.DataFrame, carry: tuple[str, ...] = ()) -> pd.DataFrame | None:
    """Segmented-vectorized decode of a whole pandas batch of postings rows
    — the decoder mirror of ``_encode_chunk_arrow``: ONE varbyte decode over
    the batch's concatenated gap/tf streams, doc_ids via a reset-at-block
    cumsum, ZERO per-row Python loops (the old ``to_dict('records')`` loop
    paid per-posting-row Python dispatch, fatal on the compaction/
    equivalence paths where rows = every term in the index).

    ``carry``: extra row-level columns (e.g. an LSM segment id) repeated
    onto every emitted triple, same np.repeat idiom as ``term``."""
    if pdf.empty:
        return None
    from search_engine_core_spark.functions.varbyte import vb_decode as _vbd

    df_row = pdf["df"].to_numpy(dtype=np.int64)
    bn_flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["block_n"]])
    bf_flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["block_first"]])
    total = int(df_row.sum())
    # value-index of each block's first posting within the concat stream
    block_starts = np.concatenate(([0], np.cumsum(bn_flat)[:-1]))
    is_start = np.zeros(total, dtype=bool)
    is_start[block_starts] = True
    gaps_all = _vbd(b"".join(pdf["doc_gaps"]), count=total - block_starts.size)
    tf_all = _vbd(b"".join(pdf["tfs"]), count=total)
    # biased values: block firsts at starts, gaps elsewhere; cumsum with a
    # per-block reset (cs[i] - cs[start] + vals[start]) — exact under u64 wrap
    vals = np.empty(total, dtype=np.uint64)
    vals[is_start] = bf_flat.astype(np.uint64) + np.uint64(1 << 63)
    vals[~is_start] = gaps_all
    cs = np.cumsum(vals, dtype=np.uint64)
    blk_of = np.cumsum(is_start) - 1
    u = cs - cs[block_starts[blk_of]] + vals[block_starts[blk_of]]
    out = {
        "doc_id": unbias(u),
        "term": np.repeat(pdf["term"].to_numpy(), df_row),
        "tf": tf_all.astype(np.int64),
    }
    for c in carry:
        out[c] = np.repeat(pdf[c].to_numpy(), df_row)
    return pd.DataFrame(out)


def _multi_arange(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated [start_i, start_i+len_i) ranges, no per-range loop.
    Zero-length ranges are dropped first — they would alias positions in
    the cumsum-reset idiom below."""
    nz = lens > 0
    starts, lens = starts[nz], lens[nz]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = starts + lens
    incr = np.ones(total, dtype=np.int64)
    pos = np.cumsum(np.concatenate(([0], lens[:-1])))
    incr[pos] = starts
    incr[pos[1:]] -= ends[:-1] - 1
    return np.cumsum(incr)


def decode_masked_batch(pdf: pd.DataFrame, block_mask_fn):
    """Segmented-vectorized decode of SELECTED blocks across a whole
    pandas batch of postings rows — the block-mask twin of
    ``_decode_chunk`` (r2 VERDICT #4: the per-row ``to_dict('records')``
    loops in the block-targeted/θ-pruned paths, vectorized). Per-VALUE
    and per-BLOCK work is pure numpy; only the unavoidable per-row array
    unpacking remains (same cost class as ``_decode_chunk``).

    ``block_mask_fn(bf, bl, bmax, row_of_block) -> bool mask`` decides
    which flat blocks decode, given each block's first/last doc_id, max
    tf, and owning batch-row index. Unselected blocks are never
    byte-read. Returns ``(doc_ids int64, tfs uint64, val_row int64)``
    where ``val_row`` maps each posting back to its batch row (for term
    lookup), or None when nothing survives."""
    if pdf.empty:
        return None
    nb = np.array([len(x) for x in pdf["block_n"]], dtype=np.int64)
    if nb.sum() == 0:
        return None
    bn_flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["block_n"]])
    bf_flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["block_first"]])
    bl_flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["block_last"]])
    go_flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["block_gap_off"]])
    to_flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["block_tf_off"]])
    bmax_flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["block_max_tf"]])
    row_of_block = np.repeat(np.arange(nb.size, dtype=np.int64), nb)

    mask = block_mask_fn(bf_flat, bl_flat, bmax_flat, row_of_block)
    sel = np.flatnonzero(mask)
    if sel.size == 0:
        return None

    # byte ranges per block: next block's offset within the row, else the
    # row stream's end; row streams live at cumsum bases in the batch-
    # concatenated buffers
    def _ranges(off_flat, row_lens):
        base = np.concatenate(([0], np.cumsum(row_lens)))
        start = base[row_of_block] + off_flat
        end = np.empty_like(start)
        if start.size > 1:
            same_row = row_of_block[1:] == row_of_block[:-1]
            end[:-1] = np.where(same_row, start[1:], base[row_of_block[:-1] + 1])
        end[-1] = base[row_of_block[-1] + 1]
        return start, end

    gap_lens = np.array([len(b) for b in pdf["doc_gaps"]], dtype=np.int64)
    tf_lens = np.array([len(b) for b in pdf["tfs"]], dtype=np.int64)
    g_start, g_end = _ranges(go_flat, gap_lens)
    t_start, t_end = _ranges(to_flat, tf_lens)

    gap_buf = np.frombuffer(b"".join(pdf["doc_gaps"]), dtype=np.uint8)
    tf_buf = np.frombuffer(b"".join(pdf["tfs"]), dtype=np.uint8)
    gb = gap_buf[_multi_arange(g_start[sel], g_end[sel] - g_start[sel])]
    tb = tf_buf[_multi_arange(t_start[sel], t_end[sel] - t_start[sel])]

    bn_sel = bn_flat[sel]
    total = int(bn_sel.sum())
    gaps = vb_decode(gb.tobytes(), count=total - sel.size)
    tf_vals = vb_decode(tb.tobytes(), count=total)

    # doc ids: per-block reset cumsum over (block_first, gaps...) — the
    # exact math of _decode_chunk restricted to the selected blocks
    block_starts = np.concatenate(([0], np.cumsum(bn_sel)[:-1]))
    is_start = np.zeros(total, dtype=bool)
    is_start[block_starts] = True
    vals = np.empty(total, dtype=np.uint64)
    vals[is_start] = bf_flat[sel].astype(np.uint64) + np.uint64(1 << 63)
    vals[~is_start] = gaps
    cs = np.cumsum(vals, dtype=np.uint64)
    blk_of = np.cumsum(is_start) - 1
    u = cs - cs[block_starts[blk_of]] + vals[block_starts[blk_of]]
    val_row = np.repeat(row_of_block[sel], bn_sel)
    return unbias(u), tf_vals, val_row


def decode_postings_df(postings: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Postings rows -> (doc_id, term, tf) triples via Arrow mapInPandas —
    the inverse of build_postings; used by the materialized query path and
    the salted-vs-unsalted equivalence test. ``carry`` names extra
    row-level columns of ``postings`` (e.g. the LSM ``seg`` partition id)
    replicated onto each emitted triple — this lets the segment-tiered
    read path decode ALL segments in ONE scan and apply doc-level
    latest-wins precedence with a single (doc_id, seg) semi-join instead
    of a per-segment scan+join ladder."""
    carry = tuple(carry)

    def gen(batches):
        for pdf in batches:
            out = _decode_chunk(pdf, carry)
            if out is not None:
                yield out

    by_name = {f.name: f.dataType.simpleString() for f in postings.schema.fields}
    schema = "doc_id long, term string, tf long" + "".join(
        f", {c} {by_name[c]}" for c in carry
    )
    return postings.mapInPandas(gen, schema)


def decode_postings_for_docs(postings: DataFrame, target_ids) -> DataFrame:
    """Block-targeted decode: emit (doc_id, term, tf) ONLY for docs in
    ``target_ids``. Per row, binary-search which blocks'
    [block_first, block_last] ranges intersect the target set and byte-
    decode just those (the block offsets make the skip real); posting rows
    whose blocks all miss are never touched. This is WAND's exact-scoring
    primitive — it replaces full postings decodes for seed/survivor docs.

    ``target_ids`` is either an int64 ndarray (small sets; shipped in the
    task closure) or a ``pyspark.Broadcast`` of a SORTED-UNIQUE int64
    array — the scale path: the id set reaches each worker once via the
    broadcast machinery instead of riding every task's pickled closure."""
    from pyspark import Broadcast

    is_bc = isinstance(target_ids, Broadcast)
    targets_local = (
        None if is_bc else np.unique(np.asarray(target_ids, dtype=np.int64))
    )

    def gen(batches):
        targets = target_ids.value if is_bc else targets_local
        if targets.size == 0:
            return  # empty target set: nothing to decode (and the
            # targets[pos-1] membership probe below would IndexError)
        for pdf in batches:
            # block intersects targets iff a target falls in [first, last]
            out = decode_masked_batch(
                pdf,
                lambda bf, bl, bmax, rob: np.searchsorted(targets, bf, "left")
                < np.searchsorted(targets, bl, "right"),
            )
            if out is None:
                continue
            ids, tfs, val_row = out
            pos = np.searchsorted(targets, ids)
            keep = (pos < targets.size) & (
                targets[np.minimum(pos, targets.size - 1)] == ids
            )
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    "doc_id": ids[keep],
                    "term": pdf["term"].to_numpy()[val_row[keep]],
                    "tf": tfs[keep].astype(np.int64),
                }
            )

    return postings.mapInPandas(gen, "doc_id long, term string, tf long")
