"""Text analysis ops for training-data pipelines: token counting,
language-ID heuristic, quality scoring, document fingerprinting.

All pure Catalyst expressions (split/filter/transform lambdas run
JVM-side under whole-stage codegen — no Python). Every op has an exact
ANSI-SQL twin in ``queries_data.py`` so the driver can oracle-check it;
float-ish ratios are scaled to integers (``(1000*x)//y``) to keep
cross-engine hashes stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: closed stopword list shared with the oracle SQL (order irrelevant)
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with",
]


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


#: BPE-ish pre-tokenizer pattern (GPT-2 style simplification): letter
#: runs are one token, each digit its own token, punctuation single —
#: kept to syntax Java regex and RE2 interpret identically so the
#: DuckDB oracle counts the same matches
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count_bpe(text: Column) -> Column:
    """Pre-tokenizer token count under the BPE-ish pattern — the
    cheap-but-realistic proxy for LLM token budgeting (a real BPE
    merges within these pieces, so this upper-bounds letter-run splits
    and matches digit/punct handling)."""
    return F.regexp_count(text, F.lit(BPE_PATTERN)).cast("bigint")


def stopword_hits(text: Column) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(
        F.filter(tokens(text), lambda t: F.array_contains(stop_arr, F.lower(t)))
    ).cast("bigint")


def lang_id(text: Column) -> Column:
    """N-gram/stopword heuristic: enough English function words -> 'en';
    too short to say -> 'short'; else 'unknown'. Deterministic and
    SQL-twinned — a real model would slot in behind the same signature."""
    n = token_count(text)
    hits = stopword_hits(text)
    return (
        F.when(n < 5, F.lit("short"))
        .when(hits * 1000 >= n * 30, F.lit("en"))  # >=3% stopword mass
        .otherwise(F.lit("unknown"))
    )


def quality_score_milli(text: Column) -> Column:
    """Composite quality score x1000: stopword mass + bounded length
    signal - punctuation excess. Mirrors common heuristic filters
    (length/punct/stopword ratios) used in corpus cleaning."""
    n = token_count(text)
    stop_m = (stopword_hits(text) * F.lit(1000)) / n
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_m = (punct.cast("bigint") * F.lit(1000)) / F.length(text)
    len_sig = F.least(n, F.lit(200))
    return (
        F.floor(stop_m) + len_sig - F.floor(punct_m)
    ).cast("bigint")


#: PII patterns kept to syntax Java regex (Spark) and RE2 (DuckDB)
#: interpret identically: no lookaround, no word boundaries, greedy
#: char-class runs only (leftmost-longest == leftmost-first for these)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: explicit [ \t] instead of \s: Java's \s includes vertical tab (\x0B),
#: RE2's does not — the shared-interpretation invariant above requires
#: spelling out the exact whitespace set
PII_PHONE = r"\+?[0-9][0-9()\- \t]{6,}[0-9]"
PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_redact(text: Column) -> Column:
    """Scrub emails, phone numbers, and IPv4 addresses to typed tokens —
    the standard pre-training privacy pass. Order matters: emails first
    (their local parts contain digits a phone pattern could nibble),
    then phones (dots are not in the phone class, so dotted IPs survive
    for the final pass)."""
    r = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    r = F.regexp_replace(r, PII_PHONE, "<PHONE>")
    return F.regexp_replace(r, PII_IPV4, "<IP>")


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match counts (metered BEFORE redaction, like the
    problematic_events counters meter before quarantine)."""
    return [
        F.regexp_count(text, F.lit(PII_EMAIL)).cast("bigint").alias("n_email"),
        F.regexp_count(text, F.lit(PII_PHONE)).cast("bigint").alias("n_phone"),
        F.regexp_count(text, F.lit(PII_IPV4)).cast("bigint").alias("n_ip"),
    ]


def fingerprint(text: Column) -> Column:
    """Normalized content fingerprint: lowercase, strip non-alphanumerics,
    sha256 — the exact-dedup key."""
    return F.sha2(F.regexp_replace(F.lower(text), r"[^a-z0-9]", ""), 256)


def simhash16(text: Column) -> Column:
    """16-bit SimHash over whitespace tokens: bit j is the majority vote
    of md5(token) hex digit j's high bit. Portable across engines (md5
    hex is identical everywhere); width 16 keeps the SQL twin tractable.
    """
    toks = tokens(text)
    n = F.size(toks)
    out = F.lit(0).cast("bigint")
    high = ["8", "9", "a", "b", "c", "d", "e", "f"]
    high_arr = F.array(*[F.lit(h) for h in high])

    def _bit_pred(j: int):
        # NB: must be a 1-arg lambda — PySpark treats 2-arg lambdas
        # (even with defaults) as the (element, index) signature
        return lambda t: F.array_contains(high_arr, F.substring(F.md5(t), j + 1, 1))

    for j in range(16):
        cnt = F.size(F.filter(toks, _bit_pred(j)))
        out = out + F.when(cnt * 2 > n, F.lit(1 << j)).otherwise(F.lit(0))
    return out
