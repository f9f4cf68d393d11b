"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen'd) — no Python in the loop. Each operator is defined so
an ANSI-SQL oracle (DuckDB) can compute the identical result, which is how
the driver verifies them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_PATTERN = "[A-Za-z0-9]+"

# Tiny fixed stopword sets per language for the n-gram-free language-ID
# heuristic: score = matches of language-specific function words.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"],
    "es": ["el", "la", "los", "y", "es", "una", "para", "en", "que", "no"],
}


def token_count(col: Column) -> Column:
    """Alphanumeric-run token count — identical semantics in DuckDB via
    length(regexp_extract_all(text, '[A-Za-z0-9]+'))."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))


def word_count(col: Column) -> Column:
    return F.size(F.split(F.trim(col), r"\s+"))


def _marker_hits(col: Column, words: list[str]) -> Column:
    lowered = F.lower(col)
    tokens = F.regexp_extract_all(lowered, F.lit("[a-z]+"), F.lit(0))
    return F.size(F.filter(tokens, lambda t: t.isin(words)))


def language_scores(col: Column) -> dict[str, Column]:
    return {lang: _marker_hits(col, words) for lang, words in _LANG_MARKERS.items()}


def with_language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Function-word language-ID heuristic, fully JVM-side: the language with
    the most marker-word hits wins; ties and zero evidence -> 'und'."""
    scores = language_scores(F.col(text_col))
    pairs = F.array(*[F.struct(c.alias("score"), F.lit(lang).alias("lang")) for lang, c in scores.items()])
    best = F.array_max(pairs)
    return df.withColumn(
        out_col,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def with_quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality signals: length, token count, mean word length,
    alpha ratio, punctuation ratio, stopword ratio, uppercase ratio —
    the standard web-corpus quality gates (Gopher/C4-style), each expressible
    in ANSI SQL for the oracle."""
    col = F.col(text_col)
    n_chars = F.length(col)
    tokens = token_count(col)
    alpha = F.length(F.regexp_replace(col, "[^A-Za-z]", ""))
    upper = F.length(F.regexp_replace(col, "[^A-Z]", ""))
    punct = F.length(F.regexp_replace(col, "[^.,;:!?]", ""))
    stop_hits = _marker_hits(col, _LANG_MARKERS["en"])
    return (
        df.withColumn("n_chars_computed", n_chars.cast("long"))
        .withColumn("n_tokens", tokens.cast("long"))
        .withColumn("mean_token_len", F.when(tokens > 0, (alpha.cast("double") / tokens)).otherwise(F.lit(0.0)))
        .withColumn("alpha_ratio", F.when(n_chars > 0, alpha.cast("double") / n_chars).otherwise(F.lit(0.0)))
        .withColumn("upper_ratio", F.when(alpha > 0, upper.cast("double") / alpha).otherwise(F.lit(0.0)))
        .withColumn("punct_ratio", F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0)))
        .withColumn("stopword_ratio", F.when(tokens > 0, stop_hits.cast("double") / tokens).otherwise(F.lit(0.0)))
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """C4-style keep/drop gate over the quality stats."""
    stats = with_quality_stats(df, text_col)
    return stats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: sha2-256 of the whitespace-normalized, lowercased
    text — the exact-dedup key (identical in DuckDB:
    sha256(lower(regexp_replace(text, '\\s+', ' ', 'g'))))."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn(out_col, F.sha2(normalized, 256))


def char_ngrams(col: Column, n: int = 5) -> Column:
    """Array of character n-grams (shingles) of the whitespace-normalized,
    lowercased text; built-in sequence/transform — stays in codegen."""
    lowered = F.lower(F.regexp_replace(col, r"\s+", " "))
    length = F.length(lowered)
    return F.when(length < n, F.array(lowered)).otherwise(
        F.transform(F.sequence(F.lit(1), length - n + 1), lambda i: lowered.substr(i, F.lit(n)))
    )
