"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure built-in expressions (JVM/codegen); deterministic; each has a
DuckDB-expressible twin used by the correctness oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from liresolr_spark.functions.tokenizer import tokenize_expr
from liresolr_spark.ops.dedup import shingles_expr

# tiny marker-word lists (n-gram heuristic language ID)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "pour", "dans", "une"],
    "es": ["el", "la", "los", "que", "es", "para", "con", "una"],
}
STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "it", "on", "at", "by"]


def lang_scores_expr(tokens_col: Column) -> dict[str, Column]:
    """Per-language marker hit-count (the n-gram-heuristic language ID)."""
    return {
        lang: F.size(F.filter(tokens_col, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """argmax language by marker hits; deterministic tie-break by language
    code; 'und' when no markers hit."""
    toks = df.select(F.col(id_col).alias("id"),
                     tokenize_expr(F.col(text_col)).alias("toks"))
    scores = lang_scores_expr(F.col("toks"))
    pairs = F.array(*[
        F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ])
    best = F.array_min(pairs)  # min (-hits, lang) = max hits, tie -> lang asc
    return toks.select(
        "id",
        F.when(-best["neg"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        (-best["neg"]).cast("long").alias("marker_hits"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: token count, mean token length,
    punctuation ratio, stopword ratio, plus a combined score."""
    toks = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text"),
        tokenize_expr(F.col(text_col)).alias("toks"))
    n_tok = F.size("toks")
    mean_len = F.when(n_tok > 0,
                      F.aggregate(F.transform("toks", F.length),
                                  F.lit(0), lambda a, x: a + x) / n_tok
                      ).otherwise(F.lit(0.0))
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[^a-zA-Z0-9\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop = F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS_EN)))
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
    return toks.select(
        "id",
        n_tok.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Three token counts: whitespace split, code-aware tokenizer, and a
    BPE-ish regex segmentation (word pieces + individual symbols)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
         .alias("ws_tokens"),
        F.size(tokenize_expr(F.col(text_col))).alias("code_tokens"),
        F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"))
         .alias("bpe_ish_tokens"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str,
                 shingle_n: int = 5) -> DataFrame:
    """Document fingerprint: minimum md5 over n-word shingles (the min-sketch
    member of the winnowing family — a rolling-window content signature that
    is stable under small edits elsewhere in the document)."""
    toks = df.select(F.col(id_col).alias("id"),
                     tokenize_expr(F.col(text_col)).alias("toks"))
    sh = toks.select("id", shingles_expr(F.col("toks"), shingle_n).alias("sh"))
    return sh.select(
        "id",
        F.array_min(F.transform("sh", F.md5)).alias("fingerprint"),
        F.size("sh").alias("n_shingles"),
    )
