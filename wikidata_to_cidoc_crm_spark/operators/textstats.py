"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all built-in column expressions (JVM-side).

Used over the `documents` table (driver testdata) and over interleaved
text spans in the KG pipeline's pre-filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

# portable across Java regex (Spark) and RE2 (DuckDB oracle)
TOKEN_SPLIT = "[^a-z0-9]+"

# tiny per-language stopword marker sets (heuristic n-gram/stopword langid)
LANG_MARKERS = {
    "en": ["the", "and", "of", "with", "is"],
    "de": ["der", "die", "und", "von", "ist"],
    "fr": ["le", "la", "et", "de", "est"],
    "es": ["el", "la", "y", "de", "es"],
}


def token_count(df: DataFrame, text_col: str = "text",
                out: str = "n_tokens") -> DataFrame:
    """Whitespace + punctuation tokenization (BPE-ish regex split)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != "")
    return df.withColumn(out, F.size(toks))


def langid(df: DataFrame, text_col: str = "text",
           out: str = "pred_lang") -> DataFrame:
    """Stopword-vote language ID; deterministic tie-break by language code.

    Vote = number of marker words present (token membership on a bounded
    set, computed with array_intersect — no UDF).
    """
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                 lambda t: t != ""))
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        score = F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        scores.append(F.struct(score.alias("s"), F.lit(lang).alias("l")))
    # max by (score, then lexicographically FIRST language): invert lang for max
    best = F.aggregate(
        F.array(*scores),
        F.struct(F.lit(-1).alias("s"), F.lit("zz").alias("l")),
        lambda acc, x: F.when(
            (x.s > acc.s) | ((x.s == acc.s) & (x.l < acc.l)), x).otherwise(acc),
    )
    return df.withColumn(out, F.when(best.s > 0, best.l).otherwise(F.lit("und")))


def quality_score(df: DataFrame, text_col: str = "text",
                  out: str = "quality") -> DataFrame:
    """Length/punctuation/stopword heuristic in [0,1], rounded to 2."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    toks = F.filter(F.split(F.lower(txt), TOKEN_SPLIT), lambda t: t != "")
    n_tokens = F.size(toks)
    mean_tok_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(F.lower(txt), "[a-z0-9 ]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(1.0))
    en_stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    stop_ratio = F.when(
        n_tokens > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t))) / n_tokens,
    ).otherwise(F.lit(0.0))
    length_term = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    toklen_term = F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_term = F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))
    stop_term = F.least(stop_ratio * 5, F.lit(1.0))
    q = (length_term * 0.4 + toklen_term * 0.2 + punct_term * 0.2 + stop_term * 0.2)
    return df.withColumn(out, F.round(q, 2))


def fingerprint(df: DataFrame, text_col: str = "text",
                out: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of normalized text (md5 is
    portable across engines, unlike xxhash64 — used by the DuckDB oracle)."""
    return df.withColumn(out, F.md5(normalize_text(text_col)))
