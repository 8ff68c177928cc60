"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (F12 is the
reference's cosine, ``src/scoring/SearchScorer.cpp:668-690``, over sparse
term maps; here dense vectors). The scale path is sign-bit LSH bucketing:
project on fixed axes (the first ``n_bits`` dimensions), bucket by the
sign pattern, and search only the query's bucket — a 2^n_bits candidate
reduction with zero training, fully expressible in Catalyst (portable to
the SQL oracle, unlike random-hyperplane LSH whose coefficients can't be
shared across engines).

All arithmetic in float64 after an explicit cast — float32 folds differ
between engines. Fold order is left-to-right in both Spark ``aggregate``
and DuckDB ``list_dot_product``, keeping results bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. One scan, one
    TakeOrderedAndProject — embarrassingly parallel; ties broken by id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # rank by the DOUBLE-ROUNDED cosine (round 7 then 4) + id tiebreak: the
    # inner round collapses cross-engine ULP noise, the outer one is the
    # emitted precision, and making the ORDER a function of the emitted
    # value keeps the k-boundary identical on both engines.
    out = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(F.round(cosine(F.col(vec_col), q), 7), 4).alias("cos_sim"),
    )
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def signbit_bucket(vec: Column, n_bits: int = 8) -> Column:
    """LSH bucket id: bit j set iff vec[j] > 0 (1-indexed element_at)."""
    out = None
    for j in range(n_bits):
        bit = F.when(F.element_at(vec, j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def random_hyperplanes(dim: int, n_bits: int = 16, seed: int = 42):
    """Deterministic Gaussian hyperplanes for sign-LSH (seeded — the same
    plan on every driver). Returned as a plain list-of-lists so they can be
    folded into Catalyst literals."""
    import numpy as np

    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_bits, dim))
    h /= np.linalg.norm(h, axis=1, keepdims=True)
    return h.tolist()


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id: bit j set iff dot(vec, plane_j) > 0. Pure column algebra
    (n_bits dot products, each a zip_with/aggregate fold) — portable and
    whole-stage-codegen'd; random hyperplanes give each bit an unbiased
    1/2 split regardless of the embedding distribution, fixing the
    weak-recall fixed-axis projection (axes correlate with feature scale)."""
    out = None
    for j, p in enumerate(planes):
        pj = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, pj) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def multiprobe_buckets(
    query_vec: list[float], planes: list[list[float]], n_probe: int = 4
) -> list[int]:
    """The query's bucket plus the ``n_probe``-1 single-bit flips with the
    SMALLEST margin |dot(q, plane)| — the classic multi-probe LSH order
    (Lv et al., VLDB'07): a near-zero margin means the true neighbors
    plausibly sit on the other side of that hyperplane. Driver-side numpy
    on one vector; the result parameterizes a partition-prunable isin."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    h = np.asarray(planes, dtype=np.float64)
    dots = h @ q
    base = int(sum((1 << j) for j, d in enumerate(dots) if d > 0))
    # stable sort, ties by plane index — deterministic and replicable by
    # the SQL oracle's ORDER BY abs(d), j
    order = np.argsort(np.abs(dots), kind="stable")
    probes = [base]
    for j in order[: max(0, n_probe - 1)]:
        probes.append(base ^ (1 << int(j)))
    return probes


def ann_hyperplane_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production ANN path: random-hyperplane sign-LSH with multi-probe.
    At 100 TB the table is bucketed/partitioned by ``hyperplane_bucket``
    at write time, so the probe-set isin prunes to n_probe partitions;
    exact cosine re-ranks only the candidates. Recall rises with n_probe
    at linear candidate cost (n_probe/2^n_bits of the corpus)."""
    dim = len(query_vec)
    planes = random_hyperplanes(dim, n_bits, seed)
    probes = multiprobe_buckets(query_vec, planes, n_probe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.withColumn("bucket", hyperplane_bucket(F.col(vec_col), planes))
        .filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(F.round(cosine(F.col(vec_col), q), 7), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_ids: list[int] | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flat ANN: partition vectors by nearest centroid, search the
    ``n_probe`` centroids nearest the query (cosine desc, centroid index
    tiebreak), exact cosine within them. Centroids are a deterministic
    seeded sample of the corpus — or the rows named by ``centroid_ids``
    (the oracle-portable form) — one tiny collect; k-means refinement
    drops in without changing the plan shape. The assignment column is
    the write-time partition key at scale."""
    import numpy as np

    if centroids is not None:
        # caller-provided vectors (e.g. ivf_kmeans_centroids output)
        cents = [list(map(float, c)) for c in centroids]
    elif centroid_ids is not None:
        rows = (
            embeddings.filter(F.col(id_col).isin(list(centroid_ids)))
            .select(id_col, vec_col)
            .collect()
        )
        by_id = {r[id_col]: list(r[vec_col]) for r in rows}
        cents = [by_id[i] for i in centroid_ids if i in by_id]
    else:
        cents = [
            list(r[vec_col])
            for r in embeddings.select(vec_col)
            .orderBy(F.xxhash64(F.col(id_col) + seed))
            .limit(n_centroids)
            .collect()
        ]
    cn = np.asarray(cents, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    # rank probes by query-centroid cosine ROUNDED to 7 dp (stable sort,
    # centroid-index tiebreak) — the oracle's ORDER BY round(cos,7) DESC, j
    qcos = (cn @ q) / (np.linalg.norm(cn, axis=1) * max(np.linalg.norm(q), 1e-12))
    probe_ids = np.argsort(-np.round(qcos, 7), kind="stable")[:n_probe].tolist()

    # assignment: argmax over centroid cosines via an array column (a
    # when-chain would duplicate subtrees exponentially); first-position
    # tiebreak is deterministic
    v = F.col(vec_col)
    # assignment cosines rounded to 7 dp: ULP noise can't flip the argmax
    # between engines; first-position tiebreak = smallest centroid index
    sims = F.array(
        *[F.round(cosine(v, F.array(*[F.lit(float(x)) for x in c])), 7) for c in cents]
    )
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.withColumn("_sims", sims)
        .withColumn(
            "_cell", (F.array_position(F.col("_sims"), F.array_max("_sims")) - 1).cast("int")
        )
        .filter(F.col("_cell").isin(probe_ids))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(F.round(cosine(v, qarr), 7), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim) with
    cos_sim >= threshold, candidates bucketed by random-hyperplane
    sign-LSH so the join is equi-join-on-bucket + within-bucket verify —
    never an all-pairs cross join. Quadratic only within a bucket
    (2^n_bits cells; raise n_bits as the corpus grows, exactly like the
    MinHash band fan-out cap in operators/dedup.py). Recall note: a pair
    on opposite sides of any hyperplane is missed — raise recall by
    unioning pairs from a few seeds (independent bucketings), each a
    separate cheap pass."""
    if dim is None:
        dim = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    planes = random_hyperplanes(dim, n_bits, seed)
    b = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a, c = b.alias("a"), b.alias("c")
    pairs = a.join(c, "bucket").filter(F.col("a.vec_id") < F.col("c.vec_id"))
    cos = F.round(F.round(cosine(F.col("a.v"), F.col("c.v")), 7), 4)
    return (
        pairs.select(
            F.col("a.vec_id").alias("id_a"),
            F.col("c.vec_id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_bucket_n: bool = False,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's sign-bit bucket.
    At 100 TB the embeddings table is written partitioned by bucket so this
    is a single-partition scan; recall can be raised by multi-probing
    neighboring buckets (flip one bit) — not needed for the oracle check.
    ``with_bucket_n`` adds the candidate-set size (rows sharing the query's
    bucket in the INPUT frame) as a constant ``bucket_n`` column — the
    per-bucket histogram value the driver oracle recomputes (the window is
    over the already bucket-pruned candidates, never the full table)."""
    qbucket = 0
    for j in range(n_bits):
        if float(query_vec[j]) > 0:
            qbucket |= 1 << j
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = embeddings.withColumn(
        "bucket", signbit_bucket(F.col(vec_col), n_bits)
    ).filter(F.col("bucket") == qbucket)
    cols = [
        F.col(id_col).alias("vec_id"),
        F.round(F.round(cosine(F.col(vec_col), q), 7), 4).alias("cos_sim"),
    ]
    if with_bucket_n:
        from pyspark.sql import Window

        cols.append(
            F.count(F.lit(1)).over(Window.partitionBy("bucket")).alias("bucket_n")
        )
    return (
        cand.select(*cols)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means refinement of the seeded-sample IVF centroids —
    the drop-in the q43 docstring promised. Each iteration is one
    distributed assign (the same rounded-cosine argmax expression
    ``ivf_topk`` uses, so training and search partition identically) plus
    one tiny (cluster, dim) mean — posexplode -> groupBy avg ->
    n_centroids x dim rows collected to the driver (a few KB; the loop is
    bounded by ``n_iters``, never data-dependent). Empty cells keep their
    previous centroid (standard Lloyd degeneracy handling). Feed the
    result to ``ivf_topk(centroids=...)``; at scale the final assignment
    is the write-time partition key."""
    import numpy as np

    cents = [
        list(map(float, r[vec_col]))
        for r in embeddings.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col) + seed))
        .limit(n_centroids)
        .collect()
    ]
    v = F.col(vec_col)
    for _ in range(n_iters):
        sims = F.array(
            *[F.round(cosine(v, F.array(*[F.lit(float(x)) for x in c])), 7) for c in cents]
        )
        assigned = embeddings.withColumn(
            "_cell", (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
        )
        means = (
            assigned.select("_cell", F.posexplode(v).alias("dim", "val"))
            .groupBy("_cell", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["_cell"], {})[r["dim"]] = float(r["m"])
        new_cents = []
        for ci, old in enumerate(cents):
            got = by_cell.get(ci)
            new_cents.append(
                [got.get(d, 0.0) for d in range(len(old))] if got else old
            )
        cents = new_cents
    return cents
