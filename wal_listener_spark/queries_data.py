"""Training-data pipeline queries + DuckDB oracles (dedup, similarity,
text analysis, multimodal plumbing) over the driver's ``documents`` and
``embeddings`` tables.

Duplicate-bearing corpora are synthesized deterministically in BOTH
engines (exact copies at doc_id+100000 for doc_id%4==0; near-copies with
a 3-token tail at doc_id+200000 for doc_id%3==0) so dedup ops have real
positives to find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import dedup, multimodal, similarity, text as textfn

NEAR_TAIL = " zz extra pad"
ANN_QUERY_IDS = list(range(8))
ANN_K = 5
ANN_LSH_BITS = 6
EMB_DIM = 64  # driver testdata embeddings are 64-dim (TESTDATA.md)
#: IVF coarse-quantizer seed vectors (k-means-free, deterministic)
IVF_CENT_IDS = [3 + 64 * i for i in range(8)]
IVF_N_PROBE = 2


def _lsh_plane_weights(bits: int = ANN_LSH_BITS, dim: int = EMB_DIM):
    """The SAME deterministic hyperplane weights similarity.
    hyperplane_bucket inlines as Catalyst literals, reused verbatim so
    the DuckDB oracle and the Spark plan share one closed form."""
    return similarity.plane_weights(bits, dim)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _corpus_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.col("text")
    )
    return d.unionByName(copies)


def _corpus_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_TAIL)).alias("text"),
    )
    return d.unionByName(copies)


# ------------------------------------------------------------------ queries


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_corpus_exact(spark, sf_dir))


def q_dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_candidate_pairs(_corpus_near(spark, sf_dir))


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Jaccard over 3-shingles for the deterministic near-pair set."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    orig = d.filter(F.col("doc_id") % 3 == 0)
    pairs = orig.select(
        F.col("doc_id").alias("a"),
        (F.col("doc_id") + 200000).alias("b"),
        F.col("text").alias("text_a"),
        F.concat(F.col("text"), F.lit(NEAR_TAIL)).alias("text_b"),
    )
    return pairs.select(
        "a",
        "b",
        dedup.jaccard_milli(F.col("text_a"), F.col("text_b")).alias("jaccard_m"),
    )


def q_dedup_simhash(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", textfn.simhash16(F.col("text")).alias("simhash"))


def _emb_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding corpus with deterministic near-duplicates: exact copies
    at vec_id+100000 (vec_id%5==0) and x2-rescaled copies at +200000
    (vec_id%7==0) — cosine is scale-invariant, so both are cos==1
    positives, and x2 is FP-exact in both engines."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    copies = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), F.col("embedding")
    )
    scaled = e.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    return e.unionByName(copies).unionByName(scaled)


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup: LSH-bucketed self-join, cos >= 0.999."""
    return dedup.embedding_near_dup_pairs(
        _emb_with_dups(spark, sf_dir), threshold_milli=9990, bits=ANN_LSH_BITS
    )


def q_dedup_embedding_cosine_mt(spark, sf_dir):
    """Multi-table variant (n_tables=2): union of two independent
    hyperplane bucketings, distinct'd — recall is a superset of the
    single-table result at the same per-table plan shape (how LSH
    recall is tuned at 100 TB without widening any one shuffle)."""
    return dedup.embedding_near_dup_pairs(
        _emb_with_dups(spark, sf_dir), threshold_milli=9990,
        bits=ANN_LSH_BITS, n_tables=2,
    )


def q_ann_cosine_topk(spark, sf_dir):
    return similarity.brute_force_topk(_emb(spark, sf_dir), ANN_QUERY_IDS, ANN_K)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat approximate variant: probe the 2 nearest of 8 cells."""
    return similarity.ivf_topk(
        _emb(spark, sf_dir), ANN_QUERY_IDS, IVF_CENT_IDS,
        ANN_K, n_probe=IVF_N_PROBE,
    )


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate variant (scale path); fully oracled —
    the hyperplanes are deterministic md5 functions DuckDB reproduces."""
    return similarity.lsh_topk(
        _emb(spark, sf_dir), ANN_QUERY_IDS, ANN_K, bits=ANN_LSH_BITS
    )


def q_text_token_count(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        textfn.token_count(F.col("text")).alias("n_tokens"),
        textfn.token_count_bpe(F.col("text")).alias("n_tokens_bpe"),
        F.length("text").cast("bigint").alias("n_chars_len"),
    )


def q_text_lang_id(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        textfn.lang_id(F.col("text")).alias("lang_id"),
        textfn.stopword_hits(F.col("text")).alias("stop_hits"),
    )


def q_text_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", textfn.quality_score_milli(F.col("text")).alias("quality_m")
    )


def q_text_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", textfn.fingerprint(F.col("text")).alias("fp"))


def q_text_pii_redact(spark, sf_dir):
    """PII scrub over documents with deterministically injected PII
    (email + phone + IPv4 derived from doc_id appended to the text) so
    the redaction patterns are actually exercised — the oracle builds
    the identical string and applies RE2 twins of the Java patterns.
    The full redacted string is hash-compared across engines."""
    d = _docs(spark, sf_dir)
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" host 10.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 250).cast("string"),
    )
    return d.select(
        "doc_id",
        textfn.pii_redact(pii_text).alias("redacted"),
        *textfn.pii_counts(pii_text),
    )


def q_text_repetition(spark, sf_dir):
    """Repetition / boilerplate signal: duplicate-token mass and the
    top token's frequency per document (explode -> two-level agg; the
    partial aggregation collapses per-(doc, token) counts map-side, so
    the shuffle carries distinct tokens, not raw tokens)."""
    d = _docs(spark, sf_dir)
    per = (
        d.select("doc_id", F.explode(textfn.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    distinct = F.count(F.lit(1))
    return per.groupBy("doc_id").agg(
        n.cast("bigint").alias("n_tokens"),
        distinct.cast("bigint").alias("n_distinct_tokens"),
        F.max("c").cast("bigint").alias("top_tok_count"),
        F.floor((n - distinct) * 1000 / n).cast("bigint").alias("dup_milli"),
    )


def q_mm_decode_meta(spark, sf_dir):
    """Binary containers (PNG/WAV/GIF) synthesized, then header-parsed
    back; the oracle checks the parsed fields against the closed form.
    payload_sha is exercised by tests (the oracle cannot rebuild the
    CRC-framed binary in SQL)."""
    with_payload = multimodal.attach_payload(_docs(spark, sf_dir))
    return multimodal.extract_metadata(with_payload).drop("payload_sha")


def q_mm_resize_meta(spark, sf_dir):
    """Container-level resize (PNG IHDR / GIF screen-descriptor rewrite
    with a recomputed CRC) then re-parse: images report the target
    dimensions, audio passes through, byte counts stay closed-form."""
    wp = multimodal.attach_payload(_docs(spark, sf_dir))
    resized = multimodal.resize_images(wp, 64, 48)
    return multimodal.extract_metadata(resized).drop("payload_sha")


def q_mm_frame_sample(spark, sf_dir):
    """WAV frame sampling (keep every 4th block_align frame, RIFF/data
    sizes patched) then re-parse: the audio byte count shrinks by the
    closed-form kept-frame count; images pass through."""
    wp = multimodal.attach_payload(_docs(spark, sf_dir))
    sampled = multimodal.frame_sample_audio(wp, 4)
    return multimodal.extract_metadata(sampled).drop("payload_sha")


def q_mm_pixel_stats(spark, sf_dir):
    """REAL pixel decode: per-document grayscale PNGs (pixel(x,y) =
    (x+y+doc_id)%256, mixed None/Sub/Up scanline filters, zlib IDAT)
    decoded with stdlib zlib + numpy inside the Arrow batch; the oracle
    recomputes the decoded-pixel statistics from the closed form."""
    wp = multimodal.attach_pixel_png(_docs(spark, sf_dir))
    return multimodal.pixel_stats(wp)


DATA_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_embedding_cosine_mt": q_dedup_embedding_cosine_mt,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "text_token_count": q_text_token_count,
    "text_lang_id": q_text_lang_id,
    "text_quality": q_text_quality,
    "text_fingerprint": q_text_fingerprint,
    "text_pii_redact": q_text_pii_redact,
    "text_repetition": q_text_repetition,
    "mm_decode_meta": q_mm_decode_meta,
    "mm_resize_meta": q_mm_resize_meta,
    "mm_frame_sample": q_mm_frame_sample,
    "mm_pixel_stats": q_mm_pixel_stats,
}

# ------------------------------------------------------------------ oracles

_CORPUS_EXACT = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id+100000, text FROM documents WHERE doc_id%4=0
)"""

_CORPUS_NEAR = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id+200000, text || '{NEAR_TAIL}' FROM documents WHERE doc_id%3=0
)"""

_FP = "sha256(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))"

_TOK = r"string_split_regex(trim(text), '\s+')"

_SHINGLES = (
    "list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2])"
)


def _sig_sql(num_hashes: int = dedup.NUM_HASHES) -> str:
    mins = ", ".join(
        f"list_min(list_transform(s, x -> md5('{i}:'||x)))" for i in range(num_hashes)
    )
    return f"[{mins}]"


def _simhash_sql() -> str:
    high = "('8','9','a','b','c','d','e','f')"
    terms = " + ".join(
        f"(CASE WHEN 2*len(list_filter(t, x -> substr(md5(x), {j+1}, 1) IN {high})) > len(t) THEN {1 << j} ELSE 0 END)"
        for j in range(16)
    )
    return terms


_STOPLIST = ", ".join(f"'{s}'" for s in textfn.STOPWORDS)


def _bucket_sign_terms(table: int = 0) -> str:
    """SQL expression for the hyperplane-sign bucket over a DOUBLE[]
    column ``v`` (weights inlined as literals — _lsh_plane_weights;
    ``table`` selects an independent hash table, same seeds as
    similarity.plane_weights)."""
    weights = similarity.plane_weights(ANN_LSH_BITS, EMB_DIM, table)
    return " + ".join(
        f"(CASE WHEN list_dot_product(v, {w}::DOUBLE[]) > 0 THEN {1 << p} ELSE 0 END)"
        for p, w in enumerate(weights)
    )


def _ann_lsh_oracle_sql() -> str:
    """DuckDB twin of similarity.lsh_topk: identical hyperplane bucket
    (weights inlined as literals — see _lsh_plane_weights), identical
    cosine/rank/floor formulation as the brute-force oracle, restricted
    to the query's own bucket."""
    sign_terms = _bucket_sign_terms()
    ids = ", ".join(map(str, ANN_QUERY_IDS))
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bk AS (SELECT vec_id, v, ({sign_terms})::BIGINT AS bucket FROM base),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM bk
      WHERE vec_id IN ({ids})),
s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         list_dot_product(qv, v) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cos
  FROM q JOIN bk b ON b.bucket = qbucket AND b.vec_id <> query_id
)
SELECT query_id, neighbor_id,
       (row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id))::INT AS rank,
       floor(cos*10000)::BIGINT AS cos_milli
FROM s
QUALIFY rank <= {ANN_K}"""


def data_oracle_sql() -> dict[str, str]:
    n_bands = dedup.NUM_HASHES // dedup.BAND_ROWS
    return {
        "dedup_exact": f"""
WITH {_CORPUS_EXACT},
h AS (SELECT doc_id, {_FP} AS fp FROM corpus)
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
       count(*) OVER (PARTITION BY fp) AS group_size
FROM h""",
        "dedup_minhash_lsh": f"""
WITH {_CORPUS_NEAR},
tok AS (SELECT doc_id, {_TOK} AS t FROM corpus),
sh AS (SELECT doc_id, {_SHINGLES} AS s FROM tok WHERE len(t) >= 3),
sig AS (SELECT doc_id, {_sig_sql()} AS sig FROM sh),
bk AS (
  SELECT doc_id, b.range AS band,
         md5(sig[2*b.range+1] || sig[2*b.range+2]) AS bucket
  FROM sig, range({n_bands}) b
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM bk l JOIN bk r
  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id""",
        "dedup_ngram_jaccard": f"""
WITH pairs AS (
  SELECT doc_id AS a, doc_id+200000 AS b, text AS text_a,
         text || '{NEAR_TAIL}' AS text_b
  FROM documents WHERE doc_id%3=0
),
sh AS (
  SELECT a, b,
    list_distinct((SELECT {_SHINGLES} FROM (SELECT {_TOK.replace('text', 'text_a')} AS t))) AS sa,
    list_distinct((SELECT {_SHINGLES} FROM (SELECT {_TOK.replace('text', 'text_b')} AS t))) AS sb
  FROM pairs
),
j AS (
  SELECT a, b,
    len(list_filter(sa, x -> list_contains(sb, x))) AS inter,
    len(sa) + len(sb) - len(list_filter(sa, x -> list_contains(sb, x))) AS un
  FROM sh
)
SELECT a, b, CASE WHEN un > 0 THEN (10000*inter)//un ELSE 0 END AS jaccard_m
FROM j""",
        "dedup_simhash": f"""
WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents)
SELECT doc_id, ({_simhash_sql()})::BIGINT AS simhash FROM tok""",
        "ann_cosine_topk": f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM base
      WHERE vec_id IN ({", ".join(map(str, ANN_QUERY_IDS))})),
s AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         list_dot_product(qv, v) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cos
  FROM q, base b WHERE b.vec_id <> query_id
)
SELECT query_id, neighbor_id,
       (row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id))::INT AS rank,
       floor(cos*10000)::BIGINT AS cos_milli
FROM s
QUALIFY rank <= {ANN_K}""",
        "text_token_count": f"""
SELECT doc_id, len({_TOK})::BIGINT AS n_tokens,
       len(regexp_extract_all(text, '{textfn.BPE_PATTERN}'))::BIGINT AS n_tokens_bpe,
       length(text)::BIGINT AS n_chars_len
FROM documents""",
        "text_lang_id": f"""
WITH tok AS (
  SELECT doc_id, {_TOK} AS t FROM documents
), m AS (
  SELECT doc_id, len(t) AS n,
         len(list_filter(t, w -> lower(w) IN ({_STOPLIST}))) AS hits
  FROM tok
)
SELECT doc_id,
  CASE WHEN n < 5 THEN 'short'
       WHEN hits*1000 >= n*30 THEN 'en'
       ELSE 'unknown' END AS lang_id,
  hits::BIGINT AS stop_hits
FROM m""",
        "text_quality": f"""
WITH tok AS (
  SELECT doc_id, text, {_TOK} AS t FROM documents
), m AS (
  SELECT doc_id, len(t) AS n,
    len(list_filter(t, w -> lower(w) IN ({_STOPLIST}))) AS hits,
    length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct,
    length(text) AS nc
  FROM tok
)
SELECT doc_id,
  ((hits*1000)//n + least(n, 200) - (punct*1000)//nc)::BIGINT AS quality_m
FROM m""",
        "text_pii_redact": f"""
WITH pii AS (
  SELECT doc_id,
    text || ' contact user' || doc_id::VARCHAR ||
    '@example.com or +1 (555) 010-' ||
    lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
    ' host 10.0.' || (doc_id % 250)::VARCHAR || '.' ||
    ((doc_id * 7) % 250)::VARCHAR AS t
  FROM documents
)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(t, '{textfn.PII_EMAIL}', '<EMAIL>', 'g'),
      '{textfn.PII_PHONE}', '<PHONE>', 'g'),
    '{textfn.PII_IPV4}', '<IP>', 'g') AS redacted,
  len(regexp_extract_all(t, '{textfn.PII_EMAIL}'))::BIGINT AS n_email,
  len(regexp_extract_all(t, '{textfn.PII_PHONE}'))::BIGINT AS n_phone,
  len(regexp_extract_all(t, '{textfn.PII_IPV4}'))::BIGINT AS n_ip
FROM pii""",
        "text_repetition": f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS tok FROM documents
), per AS (
  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
)
SELECT doc_id, sum(c)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_distinct_tokens,
       max(c)::BIGINT AS top_tok_count,
       (((sum(c) - count(*)) * 1000) // sum(c))::BIGINT AS dup_milli
FROM per GROUP BY doc_id""",
        "ann_lsh_topk": _ann_lsh_oracle_sql(),
        "ann_ivf_topk": f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cid, v AS cv FROM base
          WHERE vec_id IN ({", ".join(map(str, IVF_CENT_IDS))})),
sc AS (
  SELECT b.vec_id, b.v, c.cid,
         list_dot_product(b.v, c.cv) /
         (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
  FROM base b, cents c
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY ccos DESC, cid) AS crank
  FROM sc
),
corpus AS (SELECT vec_id, v, cid FROM rk WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, v AS qv, cid AS qcid FROM rk
  WHERE crank <= {IVF_N_PROBE}
    AND vec_id IN ({", ".join(map(str, ANN_QUERY_IDS))})
),
s AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         list_dot_product(qv, c.v) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
  FROM probes p JOIN corpus c ON c.cid = p.qcid AND c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id,
       (row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id))::INT AS rank,
       floor(cos*10000)::BIGINT AS cos_milli
FROM s
QUALIFY rank <= {ANN_K}""",
        "dedup_embedding_cosine": f"""
WITH src AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
corpus AS (
  SELECT vec_id, v FROM src
  UNION ALL SELECT vec_id+100000, v FROM src WHERE vec_id%5=0
  UNION ALL SELECT vec_id+200000, list_transform(v, x -> x*2) FROM src
    WHERE vec_id%7=0
),
bk AS (SELECT vec_id, v, ({_bucket_sign_terms()})::BIGINT AS bucket FROM corpus),
p AS (
  SELECT l.vec_id AS a, r.vec_id AS b,
         round(10000 * list_dot_product(l.v, r.v) /
               (sqrt(list_dot_product(l.v, l.v)) *
                sqrt(list_dot_product(r.v, r.v))))::BIGINT AS cos_milli
  FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
)
SELECT a, b, cos_milli FROM p WHERE cos_milli >= 9990""",
        "dedup_embedding_cosine_mt": f"""
WITH src AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
corpus AS (
  SELECT vec_id, v FROM src
  UNION ALL SELECT vec_id+100000, v FROM src WHERE vec_id%5=0
  UNION ALL SELECT vec_id+200000, list_transform(v, x -> x*2) FROM src
    WHERE vec_id%7=0
),
bk AS (SELECT vec_id, v,
       ({_bucket_sign_terms(0)})::BIGINT AS bucket0,
       ({_bucket_sign_terms(1)})::BIGINT AS bucket1
       FROM corpus),
p AS (
  SELECT l.vec_id AS a, r.vec_id AS b,
         round(10000 * list_dot_product(l.v, r.v) /
               (sqrt(list_dot_product(l.v, l.v)) *
                sqrt(list_dot_product(r.v, r.v))))::BIGINT AS cos_milli
  FROM bk l JOIN bk r
    ON (l.bucket0 = r.bucket0 OR l.bucket1 = r.bucket1)
   AND l.vec_id < r.vec_id
)
SELECT DISTINCT a, b, cos_milli FROM p WHERE cos_milli >= 9990""",
        "text_fingerprint": f"""
SELECT doc_id, {_FP} AS fp FROM documents""",
        # closed form of the synthesized containers: fixed header sizes
        # (PNG 8+25+12 IHDR/IDAT framing+12 IEND = 57; WAV RIFF+fmt+data
        # headers = 44; GIF 6+7+1 trailer = 14) + the text data section
        "mm_decode_meta": """
SELECT doc_id,
  CASE doc_id%3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
       ELSE 'image/gif' END AS modality,
  (CASE WHEN doc_id%3 IN (0,2) THEN 16 + doc_id%240 END)::INT AS width,
  (CASE WHEN doc_id%3 IN (0,2) THEN 16 + (doc_id//3)%200 END)::INT AS height,
  (CASE WHEN doc_id%3=1 THEN 8000 + (doc_id%5)*8000 END)::INT AS sample_rate,
  (CASE WHEN doc_id%3=1 THEN 1 + doc_id%2 END)::INT AS channels,
  (octet_length(encode(text)) +
   CASE doc_id%3 WHEN 0 THEN 57 WHEN 1 THEN 44 ELSE 14 END)::BIGINT AS n_bytes
FROM documents""",
        # resize: image dims -> 64x48, lengths unchanged, audio untouched
        "mm_resize_meta": """
SELECT doc_id,
  CASE doc_id%3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
       ELSE 'image/gif' END AS modality,
  (CASE WHEN doc_id%3 IN (0,2) THEN 64 END)::INT AS width,
  (CASE WHEN doc_id%3 IN (0,2) THEN 48 END)::INT AS height,
  (CASE WHEN doc_id%3=1 THEN 8000 + (doc_id%5)*8000 END)::INT AS sample_rate,
  (CASE WHEN doc_id%3=1 THEN 1 + doc_id%2 END)::INT AS channels,
  (octet_length(encode(text)) +
   CASE doc_id%3 WHEN 0 THEN 57 WHEN 1 THEN 44 ELSE 14 END)::BIGINT AS n_bytes
FROM documents""",
        # frame sample every 4th block (block = 2*channels): the WAV data
        # section becomes block*ceil((len//block)/4) bytes
        "mm_frame_sample": """
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) AS L,
         1 + doc_id%2 AS ch
  FROM documents
)
SELECT doc_id,
  CASE doc_id%3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
       ELSE 'image/gif' END AS modality,
  (CASE WHEN doc_id%3 IN (0,2) THEN 16 + doc_id%240 END)::INT AS width,
  (CASE WHEN doc_id%3 IN (0,2) THEN 16 + (doc_id//3)%200 END)::INT AS height,
  (CASE WHEN doc_id%3=1 THEN 8000 + (doc_id%5)*8000 END)::INT AS sample_rate,
  (CASE WHEN doc_id%3=1 THEN ch END)::INT AS channels,
  (CASE WHEN doc_id%3=1
        THEN 44 + 2*ch * ((L//(2*ch) + 3) // 4)
        WHEN doc_id%3=0 THEN 57 + L
        ELSE 14 + L END)::BIGINT AS n_bytes
FROM m""",
        # decoded-pixel statistics from the closed form pixel(x,y) =
        # (x+y+doc_id)%256 over the w x h grid (w<=255, h<=215 — the
        # fixed ranges cover every document's dimensions)
        "mm_pixel_stats": """
WITH dims AS (
  SELECT doc_id, (16 + doc_id%240)::INT AS w, (16 + (doc_id//3)%200)::INT AS h
  FROM documents
)
SELECT d.doc_id, d.w AS width, d.h AS height,
       (d.w * d.h)::BIGINT AS n_pixels,
       SUM((x.x + y.y + d.doc_id) % 256)::BIGINT AS pix_sum
FROM dims d, range(0, 256) x(x), range(0, 216) y(y)
WHERE x.x < d.w AND y.y < d.h
GROUP BY d.doc_id, d.w, d.h""",
    }
