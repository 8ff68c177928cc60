"""Map-side partial postings: shuffle compressed partials, not triples.

The r5 build shipped every (doc_id, term, tf) triple through TWO
JVM<->Python Arrow transposes (tokenize out, encode in) with an
~800 MB/20M-row shuffle between them; profiling (OPTIMIZATION_r06.md)
showed the encoder kernel itself is ~30 ms per 160k rows — the cost was
almost entirely the row-oriented boundary and the triple-width exchange.

This module applies guide §2.3 ("aggregate before you shuffle") / §8
("shuffle a lightweight proxy") to the index build itself:

  map stage (one Arrow pass over docs):
    tokenize -> per-doc tf -> hot-term shard assignment (vectorized
    XXH64 twin of the JVM expression) -> sort by (term, shard, doc_id)
    -> varbyte-encode each (term, shard) group's doc-gap/tf streams
    => PARTIAL rows (term, shard, n, ids, tfs): ~4 bytes/posting

  exchange: repartition by (xxhash64(term), shard) — the same salted
    keying as build_postings, but carrying ~8x fewer bytes and ~40x
    fewer rows across the JVM<->Python boundary

  reduce stage (one Arrow pass over partials):
    segmented-vectorized decode of every partial in the chunk, ONE
    lexsort to doc-order each merged group, then the existing
    ``_encode_chunk_arrow`` emits the final POSTINGS_SCHEMA rows —
    byte-identical block layout to the triple path (test-pinned).

Cold terms keep shard 0 and hot terms keep the JVM shard convention
``pmod(xxhash64(doc_id), n_shards)`` via the numpy XXH64 twin
(parity test-pinned), so a partial-encoded build is logically identical
to a ``build_postings`` build: same groups, same doc order, same blocks.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.varbyte import (
    _BIAS,
    unbias,
    vb_decode,
    vb_encode_with_sizes,
)

PARTIAL_SCHEMA = "term string, shard int, n int, ids binary, tfs binary"

#: decoded-posting budget per reduce-side merge chunk: bounds the numpy
#: working set (~16 B/posting x budget ~ 64 MB) independently of how many
#: partial rows Arrow packs into one batch
MERGE_VALUE_BUDGET = 4_000_000


def _group_starts_from_terms(terms, shards: np.ndarray) -> np.ndarray:
    """Boolean new-group mask over rows sorted by (term, shard):
    vectorized string compare in Arrow C++ + shard change."""
    import pyarrow.compute as pc

    n = len(terms)
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    if n > 1:
        term_change = pc.not_equal(terms.slice(1), terms.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        new_group[1:] = term_change | (shards[1:] != shards[:-1])
    return new_group


def _encode_groups(
    doc_ids: np.ndarray, tfs: np.ndarray, new_group: np.ndarray
) -> tuple[bytes, np.ndarray, bytes, np.ndarray, np.ndarray]:
    """Varbyte-encode per-group (first + delta) doc-id and tf streams for
    rows already sorted by (group, doc_id). Returns (ids_bytes,
    ids_group_lens, tf_bytes, tf_group_lens, group_sizes)."""
    starts = np.flatnonzero(new_group)
    sizes = np.diff(np.append(starts, doc_ids.size))
    u = doc_ids.astype(np.int64).astype(np.uint64) + _BIAS
    vals = np.empty_like(u)
    vals[0] = u[0]
    vals[1:] = np.where(new_group[1:], u[1:], u[1:] - u[:-1])
    ids_bytes, ids_sizes = vb_encode_with_sizes(vals)
    tf_bytes, tf_sizes = vb_encode_with_sizes(tfs.astype(np.uint64))
    csum_i = np.concatenate(([0], np.cumsum(ids_sizes)))
    csum_t = np.concatenate(([0], np.cumsum(tf_sizes)))
    bounds = np.append(starts, doc_ids.size)
    ids_lens = csum_i[bounds[1:]] - csum_i[bounds[:-1]]
    tf_lens = csum_t[bounds[1:]] - csum_t[bounds[:-1]]
    return ids_bytes, ids_lens, tf_bytes, tf_lens, sizes


def _bin_arr(buf: bytes, lens: np.ndarray):
    import pyarrow as pa

    off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), lens.size, [None, pa.py_buffer(off.tobytes()), pa.py_buffer(buf)]
    )


def make_partial_tf_encoder(hot_bc, n_shards: int):
    """mapInArrow fn: (doc_id, content) -> PARTIAL_SCHEMA rows.

    ``hot_bc`` is a Broadcast of the hot-term set (frozenset[str]); hot
    docs shard by the JVM-parity XXH64 twin, cold terms stay shard 0 —
    exactly ``build_postings``' salting, computed without a JVM hop."""
    from search_engine_core_spark.functions.tokenizer import (
        MIN_TOKEN_LEN,
        TOKEN_SPLIT_RE,
    )
    from search_engine_core_spark.functions.xxhash import pmod_xxh64_long_np

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        try:
            pa.set_cpu_count(1)  # one task slot = one core
        except Exception:
            pass
        hot = hot_bc.value
        hot_vs = pa.array(sorted(hot), type=pa.string()) if hot else None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            toks = pc.split_pattern_regex(
                pc.utf8_lower(batch.column("content")), TOKEN_SPLIT_RE
            )
            parents = toks.value_parent_indices()
            vals = toks.flatten()
            keep = pc.greater_equal(pc.utf8_length(vals), MIN_TOKEN_LEN)
            vals = vals.filter(keep)
            parents = parents.filter(keep)
            doc_ids = pc.take(batch.column("doc_id"), parents)
            agg = (
                pa.table({"doc_id": doc_ids, "term": vals})
                .group_by(["doc_id", "term"], use_threads=False)
                .aggregate([([], "count_all")])
            )
            if agg.num_rows == 0:
                continue
            doc = agg.column("doc_id").to_numpy().astype(np.int64)
            term = agg.column("term").combine_chunks()
            tf = agg.column("count_all").to_numpy().astype(np.int64)
            shard = np.zeros(doc.size, dtype=np.int32)
            if hot_vs is not None:
                hot_mask = pc.is_in(term, value_set=hot_vs).to_numpy(
                    zero_copy_only=False
                )
                if hot_mask.any():
                    shard[hot_mask] = pmod_xxh64_long_np(doc[hot_mask], n_shards)
            order = pc.sort_indices(
                pa.table({"term": term, "shard": pa.array(shard), "doc_id": pa.array(doc)}),
                sort_keys=[("term", "ascending"), ("shard", "ascending"), ("doc_id", "ascending")],
            ).to_numpy().astype(np.int64)
            term_s = pc.take(term, pa.array(order))
            if isinstance(term_s, pa.ChunkedArray):
                term_s = term_s.combine_chunks()
            shard_s = shard[order]
            doc_s = doc[order]
            tf_s = tf[order]
            new_group = _group_starts_from_terms(term_s, shard_s)
            yield _partial_batch_from_sorted(
                term_s, np.flatnonzero(new_group), shard_s, doc_s, tf_s, new_group
            )

    return fn


def _partial_batch_from_sorted(term_per_group_src, group_src_idx, shard_s, doc_s, tf_s, new_group):
    """Build one PARTIAL RecordBatch from value arrays already sorted by
    (term, shard, doc_id). ``term_per_group_src``/``group_src_idx``:
    a string source array + per-group indices into it (so term strings
    materialize once per GROUP, never per value)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ids_b, ids_lens, tf_b, tf_lens, sizes = _encode_groups(doc_s, tf_s, new_group)
    return pa.RecordBatch.from_arrays(
        [
            pc.take(term_per_group_src, pa.array(group_src_idx)),
            pa.array(shard_s[np.flatnonzero(new_group)].astype(np.int32)),
            pa.array(sizes.astype(np.int32)),
            _bin_arr(ids_b, ids_lens),
            _bin_arr(tf_b, tf_lens),
        ],
        names=["term", "shard", "n", "ids", "tfs"],
    )


def make_postings_to_partials(hot_bc, n_shards: int, exclude_bc=None,
                              latest_bc=None):
    """mapInPandas fn: compressed POSTINGS rows -> PARTIAL rows, for the
    compaction paths (guide §8: the rewrite's shuffle moves ~4 B/posting
    partials instead of decoded triples). Per batch, segmented-vectorized:
    decode every block (``decode_masked_batch``), drop superseded docs
    via the broadcast sorted id array (the same discipline as
    ``decode_postings_for_docs``), re-assign hot-term shards with the
    JVM-parity XXH64 twin, re-sort and partial-encode. Term strings touch
    Python only once per output GROUP.

    ``latest_bc`` (segment merges): Broadcast of ``(sorted doc ids,
    aligned latest-seg)`` — input rows must then carry a ``seg`` column,
    and a posting survives iff its doc's LATEST segment is the row's
    (doc-level latest-wins applied during the decode, no triple join)."""

    def gen(batches):
        import pyarrow as pa

        from search_engine_core_spark.operators.postings import decode_masked_batch

        hot = hot_bc.value
        excl = exclude_bc.value if exclude_bc is not None else None
        latest = latest_bc.value if latest_bc is not None else None
        for pdf in batches:
            if pdf.empty:
                continue
            out = decode_masked_batch(
                pdf, lambda bf, bl, bmax, rob: np.ones(bf.size, dtype=bool)
            )
            if out is None:
                continue
            ids, tfs, val_row = out
            if excl is not None and excl.size:
                pos = np.searchsorted(excl, ids)
                sup = (pos < excl.size) & (
                    excl[np.minimum(pos, excl.size - 1)] == ids
                )
                if sup.any():
                    keep = ~sup
                    ids, tfs, val_row = ids[keep], tfs[keep], val_row[keep]
            if latest is not None and ids.size:
                l_ids, l_segs = latest
                row_seg = pdf["seg"].to_numpy()[val_row]
                pos = np.searchsorted(l_ids, ids)
                inb = pos < l_ids.size
                keep = inb & (l_ids[np.minimum(pos, l_ids.size - 1)] == ids)
                keep &= l_segs[np.minimum(pos, l_ids.size - 1)] == row_seg
                ids, tfs, val_row = ids[keep], tfs[keep], val_row[keep]
            if ids.size == 0:
                continue
            terms_row = pdf["term"].to_numpy()
            row_hot = np.fromiter(
                (t in hot for t in terms_row), dtype=bool, count=terms_row.size
            )
            shard = np.zeros(ids.size, dtype=np.int32)
            hot_vals = row_hot[val_row]
            if hot_vals.any():
                from search_engine_core_spark.functions.xxhash import (
                    pmod_xxh64_long_np,
                )

                shard[hot_vals] = pmod_xxh64_long_np(ids[hot_vals], n_shards)
            # rows arrive doc-sorted per input row, but resharding and the
            # term's split across input rows (old shards) both reorder —
            # one lexsort restores (row-term, shard, doc) order
            order = np.lexsort((ids, shard, val_row))
            ids, tfs, val_row, shard = ids[order], tfs[order], val_row[order], shard[order]
            new_group = np.empty(ids.size, dtype=bool)
            new_group[0] = True
            new_group[1:] = (val_row[1:] != val_row[:-1]) | (shard[1:] != shard[:-1])
            # two input rows of the SAME term (shard fragments) stay
            # separate groups here — the reduce-side merger unifies them
            starts = np.flatnonzero(new_group)
            yield _partial_batch_from_sorted(
                pa.array(terms_row, type=pa.string()),
                val_row[starts],
                shard,
                ids,
                tfs.astype(np.int64),
                new_group,
            ).to_pandas()

    return gen


def make_triples_to_partials(hot_bc, n_shards: int):
    """mapInArrow fn: (doc_id, term, tf) triples -> PARTIAL rows (the
    update-tier feed of the compaction paths; same sharding/sorting as
    the doc-side encoder, minus tokenize)."""
    from search_engine_core_spark.functions.xxhash import pmod_xxh64_long_np

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        try:
            pa.set_cpu_count(1)
        except Exception:
            pass
        hot = hot_bc.value
        hot_vs = pa.array(sorted(hot), type=pa.string()) if hot else None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            term = batch.column("term")
            if isinstance(term, pa.ChunkedArray):
                term = term.combine_chunks()
            doc = batch.column("doc_id").to_numpy().astype(np.int64)
            tf = batch.column("tf").to_numpy().astype(np.int64)
            shard = np.zeros(doc.size, dtype=np.int32)
            if hot_vs is not None:
                hot_mask = pc.is_in(term, value_set=hot_vs).to_numpy(
                    zero_copy_only=False
                )
                if hot_mask.any():
                    shard[hot_mask] = pmod_xxh64_long_np(doc[hot_mask], n_shards)
            order = pc.sort_indices(
                pa.table({"term": term, "shard": pa.array(shard), "doc_id": pa.array(doc)}),
                sort_keys=[("term", "ascending"), ("shard", "ascending"), ("doc_id", "ascending")],
            ).to_numpy().astype(np.int64)
            term_s = pc.take(term, pa.array(order))
            if isinstance(term_s, pa.ChunkedArray):
                term_s = term_s.combine_chunks()
            shard_s, doc_s, tf_s = shard[order], doc[order], tf[order]
            new_group = _group_starts_from_terms(term_s, shard_s)
            starts = np.flatnonzero(new_group)
            yield _partial_batch_from_sorted(
                term_s, starts, shard_s, doc_s, tf_s, new_group
            )

    return fn


def merge_partial_sources(
    spark,
    partial_dfs: list[DataFrame],
    n_buckets: int | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Union PARTIAL-row DataFrames and run the shared reduce-side merge
    -> final POSTINGS rows (the compaction twin of
    :func:`build_postings_from_docs`'s tail)."""
    from search_engine_core_spark.operators.postings import POSTINGS_SCHEMA

    part = partial_dfs[0]
    for p in partial_dfs[1:]:
        part = part.unionByName(p)
    with_bucket = n_buckets is not None
    if with_bucket:
        part = part.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
    width = n_partitions or spark.sparkContext.defaultParallelism
    cols = (["bucket"] if with_bucket else []) + ["term", "shard", "n", "ids", "tfs"]
    arranged = (
        part.select(*cols, F.xxhash64("term").alias("_tid"))
        .repartition(width, "_tid", "shard")
        .sortWithinPartitions("_tid", "term", "shard")
        .drop("_tid")
    )
    schema = ("bucket int, " + POSTINGS_SCHEMA) if with_bucket else POSTINGS_SCHEMA
    return arranged.mapInArrow(make_partial_merger(with_bucket), schema)


def _binary_payload(col) -> bytes:
    """Concatenated payload bytes of a pyarrow binary array (zero-copy
    slice of the data buffer between the first and last offsets)."""
    arr = col.combine_chunks()
    if arr.null_count:
        raise ValueError("partial binary column must not contain nulls")
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + arr.offset + 1)
    off = off[arr.offset : arr.offset + len(arr) + 1]
    data = arr.buffers()[2]
    return data.to_pybytes()[off[0] : off[-1]] if len(arr) else b""


def _merge_chunk(tbl, with_bucket: bool):
    """Decode every partial row of ``tbl`` (complete (term, shard) groups,
    sorted), doc-sort each merged group, and final-encode via
    ``_encode_chunk_arrow`` — all segmented-vectorized."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from search_engine_core_spark.operators.postings import _encode_chunk_arrow

    n_part = tbl.num_rows
    terms = tbl.column("term").combine_chunks()
    shards = tbl.column("shard").to_numpy().astype(np.int32)
    n_flat = tbl.column("n").to_numpy().astype(np.int64)
    buckets = tbl.column("bucket").to_numpy().astype(np.int32) if with_bucket else None
    total = int(n_flat.sum())
    if total == 0:
        return None
    vals = vb_decode(_binary_payload(tbl.column("ids")), count=total)
    tfs = vb_decode(_binary_payload(tbl.column("tfs")), count=total)
    partial_starts = np.concatenate(([0], np.cumsum(n_flat)[:-1]))
    is_start = np.zeros(total, dtype=bool)
    is_start[partial_starts] = True
    # per-partial reset cumsum: first value absolute (biased), rest deltas
    cs = np.cumsum(vals, dtype=np.uint64)
    part_of_val = np.cumsum(is_start) - 1
    u = cs - cs[partial_starts[part_of_val]] + vals[partial_starts[part_of_val]]
    doc = unbias(u)
    new_group = _group_starts_from_terms(terms, shards)
    group_of_partial = np.cumsum(new_group) - 1
    group_of_val = group_of_partial[part_of_val]
    order = np.lexsort((doc, group_of_val))
    src = part_of_val[order]
    cols = {
        "term": pc.take(terms, pa.array(src)),
        "shard": pa.array(shards[src]),
        "doc_id": pa.array(doc[order]),
        "tf": pa.array(tfs[order].astype(np.int64)),
    }
    if with_bucket:
        cols = {"bucket": pa.array(buckets[src]), **cols}
    return _encode_chunk_arrow(pa.table(cols), with_bucket)


def make_partial_merger(with_bucket: bool):
    """mapInArrow fn over PARTIAL rows sorted by (term, shard): merge each
    group's partials and emit final POSTINGS_SCHEMA rows. Groups may span
    Arrow batches (tail carry, like ``_encode_partition``); oversized
    batches split at group boundaries under MERGE_VALUE_BUDGET."""

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        try:
            pa.set_cpu_count(1)
        except Exception:
            pass
        carry = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
                carry = None
            n = tbl.num_rows
            terms = tbl.column("term").combine_chunks()
            shards = tbl.column("shard").to_numpy().astype(np.int32)
            last_term = terms[n - 1]
            last_shard = shards[n - 1]
            eq = pc.and_(
                pc.equal(terms, last_term),
                pc.equal(tbl.column("shard").combine_chunks(), pa.scalar(int(last_shard), pa.int32())),
            ).to_numpy(zero_copy_only=False)
            tail_len = int(eq[::-1].argmin()) if not eq.all() else n
            tail_start = n - tail_len
            head = tbl.slice(0, tail_start)
            carry = tbl.slice(tail_start)
            yield from _merge_head(head, with_bucket)
        if carry is not None and carry.num_rows:
            yield from _merge_head(carry, with_bucket, final=True)

    return fn


def _merge_head(head, with_bucket: bool, final: bool = False):
    """Split ``head`` (complete groups) into value-budget chunks at group
    boundaries and merge-encode each."""
    if head.num_rows == 0:
        return
    n_flat = head.column("n").to_numpy().astype(np.int64)
    csum = np.cumsum(n_flat)
    if csum[-1] <= MERGE_VALUE_BUDGET:
        out = _merge_chunk(head, with_bucket)
        if out is not None:
            yield out
        return
    shards = head.column("shard").to_numpy().astype(np.int32)
    terms = head.column("term").combine_chunks()
    new_group = _group_starts_from_terms(terms, shards)
    group_starts = np.flatnonzero(new_group)
    start = 0
    while start < head.num_rows:
        base = csum[start - 1] if start else 0
        # furthest row count keeping the chunk under budget
        limit = int(np.searchsorted(csum, base + MERGE_VALUE_BUDGET, "right"))
        # retreat to the last group boundary within budget
        gi = int(np.searchsorted(group_starts, limit, "right")) - 1
        cut = int(group_starts[gi]) if gi >= 0 else 0
        if cut <= start:
            # the group at `start` alone exceeds the budget — groups are
            # indivisible here, take it whole up to the next boundary
            pos = int(np.searchsorted(group_starts, start, "right"))
            cut = int(group_starts[pos]) if pos < group_starts.size else head.num_rows
        out = _merge_chunk(head.slice(start, cut - start), with_bucket)
        if out is not None:
            yield out
        start = cut


def build_postings_from_docs(
    docs: DataFrame,
    hot_terms: list[str],
    n_shards: int,
    n_buckets: int | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, content) docs -> compressed postings rows via the
    partial-encode pipeline. ``n_buckets`` set adds the ``bucket``
    partition column (computed JVM-side on the ~40x smaller partial rows).
    ``n_partitions`` pins the merge exchange width; the default is the
    core count — partial rows are tiny, so the 4x over-partitioning the
    triple path needed for sort memory would only multiply output files
    (guide §2.2/§6)."""
    spark = docs.sparkSession
    hot_bc = spark.sparkContext.broadcast(frozenset(hot_terms))
    part = docs.select("doc_id", "content").mapInArrow(
        make_partial_tf_encoder(hot_bc, n_shards), PARTIAL_SCHEMA
    )
    return merge_partial_sources(
        spark, [part], n_buckets=n_buckets, n_partitions=n_partitions
    )
