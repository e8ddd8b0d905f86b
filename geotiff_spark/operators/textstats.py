"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All JVM built-ins (codegen hot path) so each has a
reproducible ANSI-SQL oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword inventories for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "en", "por"],
}


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(text))


# GPT-2-style pre-tokenizer, simplified to the lookaround-free core so the
# SAME pattern runs identically under Java regex (Spark) and RE2 (DuckDB):
# contractions, space-prefixed letter runs, digit runs, punctuation runs.
# Both engines use leftmost-first alternation, so matches agree exactly.
BPE_REGEX = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenizer count — the training-cost estimator a corpus
    pipeline reports next to the whitespace count (subword tokenizers
    split punctuation and digit runs that whitespace counting misses)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), F.lit(0)))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of distinct language-stopwords present (set semantics)."""
    return F.size(
        F.array_intersect(
            F.array_distinct(_tokens(text)),
            F.array(*[F.lit(w) for w in STOPWORDS[lang]]),
        )
    )


def language_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-hit score per language + argmax prediction (deterministic
    lexicographic tiebreak)."""
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"score_{lang}", stopword_hits(F.col(text), lang))
    # argmax with lang-name tiebreak: pack (score, neglang) and take max
    pairs = F.array(*[
        F.struct(
            F.col(f"score_{lang}").alias("s"),
            F.lit(lang).alias("l"),
        )
        for lang in sorted(STOPWORDS, reverse=True)
    ])
    best = F.array_max(pairs)
    return out.withColumn("pred_lang", best["l"])


def quality_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality heuristics: length, token count, mean token length,
    uppercase ratio, digit ratio, stopword ratio (en)."""
    t = F.col(text)
    n_tok = token_count(t)
    return (
        df.withColumn("n_chars_m", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_tok_len",
            F.round(
                (F.length(F.regexp_replace(t, r"\s+", "")))
                / F.greatest(n_tok, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "digit_ratio",
            F.round(
                F.length(F.regexp_replace(t, r"[^0-9]", ""))
                / F.greatest(F.length(t), F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                stopword_hits(t, "en") / F.greatest(n_tok, F.lit(1)), 6
            ),
        )
    )


def fingerprint(df: DataFrame, text: str = "text", key: str = "doc_id",
                shingle: int = 20) -> DataFrame:
    """Document fingerprint: md5 of the full text (exact identity) + the
    minimum md5 over all `shingle`-char windows (shift-robust near-dup
    fingerprint, winnowing-style). Both JVM-side: sequence → transform →
    array_min."""
    t = F.col(text)
    n_windows = F.greatest(F.length(t) - F.lit(shingle - 1), F.lit(1))
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.md5(t.substr(i, F.lit(shingle))),
    )
    return df.select(
        F.col(key),
        F.md5(t).alias("digest"),
        F.array_min(shingle_hashes).alias("min_shingle_hash"),
    )
