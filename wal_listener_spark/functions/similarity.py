"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline: broadcast the (small)
query set against the corpus — one scan, no shuffle on the corpus side,
dot products evaluated by codegen'd higher-order functions
(zip_with + aggregate), all JVM-side.

The scale path is LSH bucketing (random-hyperplane signs derived from
md5 — deterministic, engine-portable): vectors shuffle once on their
bucket signature, queries probe only their own bucket. At 100 TB this
turns an O(N*Q) scan into O(N/2^bits * Q) per probe; recall is tuned
with multiple hash tables (union of probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    Output: (query_id, neighbor_id, rank, cos_milli) — cosine scaled to
    int (x10000, floor) for portable comparison.
    """
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    joined = base.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 10000).cast("bigint").alias("cos_milli"),
        )
    )


def plane_weights(bits: int, dim: int, table: int = 0) -> list[list[int]]:
    """Deterministic pseudo-random hyperplane weights: plane p's weight
    for dimension i = (md5('{p}:{i}') first 4 hex as int) - 32768 —
    fixed, engine-independent, no RNG state. Computed ONCE driver-side
    with hashlib (the closed form of the md5 Catalyst expression) and
    inlined as literals, so the per-row work is just the dot product —
    not bits*dim constant md5 calls per vector.

    ``table`` selects an independent hash table (seed 't{table}:{p}:{i}'
    for table > 0; table 0 keeps the original '{p}:{i}' seeds so
    existing buckets stay stable) — multiple tables are how LSH recall
    is tuned without changing the per-table plan shape."""
    import hashlib

    def seed(p: int, i: int) -> bytes:
        return (f"{p}:{i}" if table == 0 else f"t{table}:{p}:{i}").encode()

    return [
        [
            int(hashlib.md5(seed(p, i)).hexdigest()[:4], 16) - 32768
            for i in range(dim)
        ]
        for p in range(bits)
    ]


def hyperplane_bucket(vec_col, bits: int = 8, dim: int = 64, table: int = 0):
    """LSH bucket: sign pattern of the vector against ``bits``
    deterministic hyperplanes (see :func:`plane_weights`). The weights
    are literal double arrays, so each plane test is one codegen'd
    zip_with/aggregate fold over the vector — identical values and fold
    order to the previous in-expression md5 form (weights are exact
    integers, losslessly representable as doubles)."""
    weights = plane_weights(bits, dim, table)
    bucket = F.lit(0).cast("bigint")
    for p in range(bits):
        warr = F.array(*[F.lit(float(w)) for w in weights[p]])
        pd = F.aggregate(
            F.zip_with(vec_col, warr, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(pd > 0, F.lit(1 << p)).otherwise(F.lit(0))
    # the literal weight arrays are sized to `dim`; a vector of any
    # other length would null-pad the zip_with, poison every plane sum
    # to NULL, and silently hash ALL vectors to bucket 0 (collapsing
    # LSH pruning into an O(N^2) self-join) — fail loudly instead
    return F.when(F.size(vec_col) == F.lit(dim), bucket).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"hyperplane_bucket: expected {dim}-dim vector, got "),
                F.size(vec_col).cast("string"),
                F.lit(" — pass dim= explicitly"),
            )
        )
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    cent_ids: list[int],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: a coarse quantizer of ``cent_ids``'
    vectors partitions the corpus into cells (one broadcast join + one
    shuffle to build the inverted file — the IVF build pass); each query
    probes its ``n_probe`` nearest cells, so the scan is
    O(N * n_probe / n_cells) instead of O(N). The quantizer here is
    k-means-free (fixed seed vectors — deterministic and
    oracle-checkable); production swaps in trained centroids behind the
    same cell-assignment shape. Same output contract as brute_force_topk.
    """
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    cents = base.filter(F.col(id_col).isin(cent_ids)).select(
        F.col(id_col).alias("cid"), F.col("v").alias("cv")
    )
    scored_cells = base.join(F.broadcast(cents)).select(
        id_col, "v", "cid", cosine(F.col("v"), F.col("cv")).alias("ccos")
    )
    w_cell = Window.partitionBy(id_col).orderBy(
        F.col("ccos").desc(), F.col("cid").asc()
    )
    ranked = scored_cells.withColumn("crank", F.row_number().over(w_cell))
    corpus = ranked.filter(F.col("crank") == 1).select(id_col, "v", "cid")
    probes = (
        ranked.filter(F.col(id_col).isin(query_ids) & (F.col("crank") <= n_probe))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col("cid").alias("qcid"),
        )
    )
    joined = corpus.join(
        F.broadcast(probes),
        (F.col("cid") == F.col("qcid")) & (F.col(id_col) != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 10000).cast("bigint").alias("cos_milli"),
        )
    )


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket.
    Same output shape as brute_force_topk (recall < 1 by design)."""
    base = emb.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
        hyperplane_bucket(F.col(vec_col), bits, dim=dim).alias("bucket"),
    )
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    joined = base.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 10000).cast("bigint").alias("cos_milli"),
        )
    )
