"""Text-analysis operators for LLM training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language-ID,
quality scoring, token counting, document fingerprinting — all pure
`pyspark.sql.functions` column expressions, so they run JVM-side inside
whole-stage codegen with zero Python overhead, and scale linearly with
a 100 TB `documents` table (no shuffle: all per-row).

Cross-engine determinism: token counts use separator counting
(length-based) rather than `split()` because split()'s trailing-empty
semantics differ across engines; fingerprints use md5 (identical hex in
Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword markers for the n-gram/stopword heuristic.
# Chosen to be deterministic and cheap (substring containment), not
# linguistically deep — the operator contract is the point.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " y "],
    "de": [" der ", " die ", " und "],
    "zh": ["的", "是", "了"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def token_count(text: Column) -> Column:
    """Whitespace token count via separator counting (engine-portable)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )


def distinct_token_count(text: Column) -> Column:
    """Unique whitespace tokens (split is safe mid-string)."""
    return F.array_size(F.array_distinct(F.split(F.trim(text), " ")))


def marker_hits(text: Column, marker: str) -> Column:
    """Occurrences of a marker substring (overlap-free, like replace)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit(""))))
        / F.length(F.lit(marker))
    ).cast("int")


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are common-English stopwords."""
    hits = None
    for w in STOPWORDS:
        h = marker_hits(text, f" {w} ")
        hits = h if hits is None else hits + h
    return hits / F.nullif(token_count(text), F.lit(0))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Composite [0,1] quality score: length band + lexical diversity
    + stopword presence. Deterministic, expressible in ANSI SQL."""
    toks = token_count(text)
    uniq_ratio = distinct_token_count(text) / F.nullif(toks, F.lit(0))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.5)
    sw = stopword_ratio(text)
    sw_ok = F.when((sw > 0.0) & (sw < 0.6), 1.0).otherwise(0.5)
    return (len_ok + uniq_ratio + sw_ok) / F.lit(3.0)


def predict_lang(text: Column) -> Column:
    """Marker-vote language ID: argmax of per-language marker hits,
    ties broken by language code order ('und' if no marker hits)."""
    scores = []
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            h = marker_hits(text, m)
            s = h if s is None else s + h
        scores.append((lang, s))
    best = F.lit("und")
    best_score = F.lit(0)
    # Iterate in reverse so earlier languages win ties (strict >).
    for lang, s in reversed(scores):
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return best


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 hex — portable)."""
    return F.md5(text.cast("binary"))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full feature bundle to a documents DataFrame."""
    t = F.col(text_col)
    return (
        df.withColumn("token_cnt", token_count(t))
        .withColumn("distinct_token_cnt", distinct_token_count(t))
        .withColumn("stopword_r", stopword_ratio(t))
        .withColumn("pred_lang", predict_lang(t))
        .withColumn("doc_fp", fingerprint(t))
    )
