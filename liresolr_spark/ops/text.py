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


def repetition_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition features for quality filtering: fraction of
    duplicate (non-unique) lines, most-frequent-token mass, and
    most-frequent word-bigram mass. High values mark boilerplate /
    degenerate documents a pre-training pipeline drops.

    Scale shape: the line metric is a pure per-row higher-order expression
    (no shuffle at all); the token/bigram modes need a per-(doc, gram)
    count — explode + two-level aggregation, which partial-aggregates
    map-side and shuffles only (doc_id, gram) partial counts. Keys are
    uniform in doc_id so a hot token creates no hot PARTITION (unlike a
    global term count, the doc_id component spreads it).

    Returns (id, n_lines, dup_line_frac, top_token_frac, top_bigram_frac),
    fractions rounded to 4 decimals; empty docs score 0.0 everywhere."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"),
                     tokenize_expr(F.col(text_col)).alias("toks"))

    lines = F.filter(F.transform(F.split("text", r"\n"), F.trim),
                     lambda x: x != "")
    n_lines = F.size(lines)
    dup_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))) / n_lines
    ).otherwise(F.lit(0.0))

    per_doc = base.select("id", n_lines.alias("n_lines"),
                          F.round(dup_frac, 4).alias("dup_line_frac"),
                          "toks", F.size("toks").alias("n_toks"))

    grams = per_doc.select(
        "id", "n_toks",
        F.explode(
            F.flatten(F.array(
                F.transform("toks", lambda t: F.struct(
                    F.lit("tok").alias("kind"), t.alias("g"))),
                F.transform(
                    F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                    lambda t, i: F.struct(
                        F.lit("bi").alias("kind"),
                        F.concat_ws(" ", t, F.element_at("toks", i + 2)).alias("g"))),
            ))
        ).alias("gram"),
    )
    top = (
        grams.groupBy("id", "n_toks", F.col("gram.kind").alias("kind"),
                      F.col("gram.g").alias("g"))
        .agg(F.count("*").alias("c"))
        .groupBy("id", "n_toks", "kind")
        .agg(F.max("c").alias("top_c"))
        .groupBy("id")
        .agg(
            F.round(F.max(F.when(F.col("kind") == "tok",
                                 F.col("top_c") / F.col("n_toks"))), 4
                    ).alias("top_token_frac"),
            F.round(F.max(F.when(F.col("kind") == "bi",
                                 F.col("top_c") / (F.col("n_toks") - 1))), 4
                    ).alias("top_bigram_frac"),
        )
    )
    return (
        per_doc.select("id", "n_lines", "dup_line_frac")
        .join(top, "id", "left")
        .select(
            "id", "n_lines", "dup_line_frac",
            F.coalesce("top_token_frac", F.lit(0.0)).alias("top_token_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
    )
