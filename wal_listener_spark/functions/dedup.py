"""Deduplication ops: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Scale design notes (the part that matters at 100 TB):
 - exact dedup is one hash-shuffle on the fingerprint — map-side partial
   aggregation makes it bandwidth-bound, not memory-bound;
 - MinHash+LSH avoids the quadratic pair explosion: signatures are
   computed scan-side (array transforms, codegen'd, no shuffle), then one
   shuffle on (band, bucket) groups candidates; only same-bucket pairs
   are compared. Bucket width (bands x rows) tunes recall/cost;
 - the self-join on buckets broadcasts nothing and AQE's skew-join
   splitting handles a degenerate hot bucket;
 - all hashing is md5-hex (engine-portable, oracle-checkable) — swap in
   xxhash64 for production speed (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens

NUM_HASHES = 12
BAND_ROWS = 2  # 6 bands x 2 rows


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical (normalized) content: (doc_id, canonical_id,
    group_size). canonical = min id in the group."""
    h = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    from pyspark.sql import Window

    w = Window.partitionBy("fp")
    return h.select(
        F.col(id_col),
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    )


def shingles(text_col, k: int = 3):
    """k-token shingles (word n-grams).

    Built from ``arrays_zip`` of k shifted slices, NOT ``element_at``
    inside a ``transform`` lambda: an array-valued expression referenced
    inside a lambda is re-evaluated PER ELEMENT (Catalyst does not hoist
    it), so the old form re-ran ``split(text)`` 3x per shingle —
    O(tokens^2) per document, measured 15.5 s for 6.7k documents where
    this form takes well under a second (guide §1.2: per-task work).
    Each slice evaluates the token array once per row; output is
    byte-identical (oracle-gated by dedup_minhash_lsh/dedup_ngram_jaccard).
    """
    toks = tokens(text_col)
    n = F.size(toks)
    zipped = F.arrays_zip(
        *[F.slice(toks, off + 1, n - (k - 1)) for off in range(k)]
    )
    return F.when(
        n >= k,
        F.transform(
            zipped,
            lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)]),
        ),
    )


def minhash_signature(sh_col, num_hashes: int = NUM_HASHES):
    """num_hashes independent min-hashes: min over md5('{i}:'||shingle).
    String min over hex == numeric min over the hash value."""
    def _hash_i(i: int):
        # 1-arg lambda required: PySpark reads 2-arg lambdas (even with
        # defaults) as the (element, index) signature
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return F.array(
        *[
            F.array_min(F.transform(sh_col, _hash_i(i)))
            for i in range(num_hashes)
        ]
    )


def lsh_buckets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, band, bucket) rows; same (band, bucket) => candidate pair.

    The shingle array and the signature are materialized (persist) before
    fan-out: without the barrier, Catalyst's projection collapse inlines
    the shingle expression into all 12 hash transforms and then the 12
    signatures into all 6 band buckets — a 72x expression blow-up that
    dominated the first benchmark run.
    """
    sh = (
        docs.select(F.col(id_col), shingles(F.col(text_col)).alias("sh"))
        .filter(F.col("sh").isNotNull())
        .persist()  # barrier: shingles computed once, not 12x
    )
    d = (
        sh.select(F.col(id_col), minhash_signature(F.col("sh")).alias("sig"))
        .persist()  # barrier: signatures computed once, not once per band
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[
                            F.element_at(F.col("sig"), b * BAND_ROWS + r + 1)
                            for r in range(BAND_ROWS)
                        ]
                    )
                ).alias("bucket"),
            )
            for b in range(NUM_HASHES // BAND_ROWS)
        ]
    )
    return d.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_candidate_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any LSH bucket."""
    b = lsh_buckets(docs, id_col, text_col)
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold_milli: int = 9990,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the scale
    path): vectors shuffle once on their hyperplane-sign bucket, the
    self-join compares only same-bucket pairs (hyperplane signs are
    scale-invariant, so exact/rescaled duplicates always collide), and
    the cosine filter keeps pairs with round(cos*10000) >= threshold.
    O(N^2 / 2^bits) comparisons instead of all-pairs; recall is tuned
    with ``n_tables`` independent hash tables (union of bucketings,
    distinct'd), same per-table plan shape.

    Output: (a, b, cos_milli) with a < b.
    """
    from .similarity import _as_double, cosine, hyperplane_bucket

    base = emb.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
        *[
            hyperplane_bucket(F.col(vec_col), bits, dim=dim, table=t)
            .alias(f"bucket{t}")
            for t in range(n_tables)
        ],
    )

    def _table_pairs(t: int):
        left = base.alias("l")
        right = base.alias("r")
        return left.join(
            right,
            (F.col(f"l.bucket{t}") == F.col(f"r.bucket{t}"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        ).select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            # round, not floor: exact-duplicate pairs sit at cos == 1
            # where a 1-ulp summation-order difference flips floor
            # across engines
            F.round(cosine(F.col("l.v"), F.col("r.v")) * 10000, 0)
            .cast("bigint")
            .alias("cos_milli"),
        ).filter(F.col("cos_milli") >= threshold_milli)

    pairs = _table_pairs(0)
    if n_tables == 1:
        return pairs
    # multi-table recall: union the per-table candidate sets and drop
    # pairs that collided in several tables (cos_milli is a pure
    # function of the pair, so distinct needs no re-join). Each table
    # is its own bucketed self-join — the per-table plan shape (one
    # shuffle on the bucket, within-bucket comparisons only) is
    # unchanged; recall rises with each independent table while the
    # threshold filter keeps the union small before the distinct.
    for t in range(1, n_tables):
        pairs = pairs.unionByName(_table_pairs(t))
    return pairs.distinct()


def jaccard_milli(text_a, text_b, k: int = 3):
    """(10000 * |A∩B|) // |A∪B| over distinct k-shingles — integer-scaled
    for engine-portable comparison."""
    sa = F.array_distinct(shingles(text_a, k))
    sb = F.array_distinct(shingles(text_b, k))
    inter = F.size(F.array_intersect(sa, sb)).cast("bigint")
    union = F.size(F.array_union(sa, sb)).cast("bigint")
    return F.when(union > 0, F.floor(inter * 10000 / union)).otherwise(F.lit(0))
