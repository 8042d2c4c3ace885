"""Corpus-cleaning operators for training-data pipelines: PII redaction,
Gopher-style quality filtering, and cross-document line dedup (boilerplate
removal).

No reference analog (Solr ships none of these; the closest is its
analyzer chain, which normalizes tokens but never rewrites or drops
documents) — these are the standard cleanup passes between raw crawl and
tokenization.

Scale shape: ``redact_pii`` and ``quality_filter`` are pure row-wise
projections (zero shuffle, codegen'd regex/array built-ins — the 100 TB
side streams through the scan). ``line_dedup`` is the only shuffling op:
one agg keyed by md5(line) to find boilerplate, then a broadcast anti-join
back (the frequent-line table is tiny by construction — only lines above
the duplication threshold survive), then one regroup by doc. Every regex
and array expression here has an exact DuckDB twin used by the oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from liresolr_spark.functions.tokenizer import tokenize_expr
from liresolr_spark.ops.text import STOPWORDS_EN

# (name, pattern, replacement) — applied IN ORDER; counts are taken on the
# text state before each step so sequential overlaps (an IP inside a longer
# digit run) resolve identically everywhere. Patterns restricted to syntax
# with identical semantics in Java regex (Spark) and RE2 (DuckDB).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{6,}\d", "<PHONE>"),
]


def redact_pii(
    df: DataFrame, text_col: str, out_col: str = "redacted",
    patterns: list[tuple[str, str, str]] = PII_PATTERNS,
) -> DataFrame:
    """Mask PII spans with typed placeholders and count each kind.

    Sequential ``regexp_count`` + ``regexp_replace`` per pattern — a pure
    projection the optimizer pipelines into the scan; adding a pattern adds
    one codegen'd expression, never a pass over the data."""
    cur = F.col(text_col)
    out = df
    for name, pat, repl in patterns:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(cur, F.lit(pat)).cast("long"))
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn(out_col, cur)


def quality_filter(
    df: DataFrame, id_col: str, text_col: str, *,
    min_tokens: int = 50, max_tokens: int = 100_000,
    min_mean_len: float = 3.0, max_mean_len: float = 10.0,
    min_stopword_ratio: float = 0.0,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Gopher-style document quality gate: length band, mean-token-length
    band, stopword floor. Emits ``keep`` plus a comma-joined ``reasons``
    string naming every failed rule (stable order), so a pipeline can both
    filter and audit drop causes in one pass.

    All signals are O(tokens) array expressions per row — no shuffle; the
    repetition signals live in ``ops.text.repetition_scores`` and compose
    by join when a pipeline wants the full Gopher rule set.

    The signals are STAGED in separate projections (tokens, then raw
    signals, then rules): inlined into one select, CollapseProject
    duplicates the tokenizer regex into every rule expression (~12
    evaluations per row — measured ~10x slower at sf0.1, same hazard as
    the shingle eval fixed in ops/dedup.decontaminate). Each staged alias
    is non-cheap and multiply-referenced downstream, which is exactly the
    condition under which the optimizer preserves the projection split."""
    passthrough = list(keep_cols or [])
    toked = df.select(
        F.col(id_col).alias("id"),
        tokenize_expr(F.col(text_col)).alias("_toks"),
        *[F.col(c) for c in passthrough],
    )
    toks, n_tok = F.col("_toks"), F.size("_toks")
    sig = toked.select(
        "id",
        n_tok.cast("long").alias("n_tokens"),
        F.when(n_tok > 0,
               F.aggregate(F.transform(toks, F.length), F.lit(0),
                           lambda a, x: a + x) / n_tok)
        .otherwise(F.lit(0.0)).alias("_mean_len"),
        F.when(n_tok > 0,
               F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN))) / n_tok)
        .otherwise(F.lit(0.0)).alias("_stop_ratio"),
        *passthrough,
    )
    rules = [  # (name, failure condition) — order defines `reasons` order
        ("too_short", F.col("n_tokens") < min_tokens),
        ("too_long", F.col("n_tokens") > max_tokens),
        ("mean_len_low", F.col("_mean_len") < min_mean_len),
        ("mean_len_high", F.col("_mean_len") > max_mean_len),
        ("few_stopwords", F.col("_stop_ratio") < min_stopword_ratio),
    ]
    fails = F.filter(
        F.array(*[F.when(cond, name).otherwise(F.lit("")) for name, cond in rules]),
        lambda x: x != "")
    return sig.select(
        "id",
        "n_tokens",
        F.round("_mean_len", 4).alias("mean_token_len"),
        F.round("_stop_ratio", 4).alias("stopword_ratio"),
        (F.size(fails) == 0).alias("keep"),
        F.array_join(fails, ",").alias("reasons"),
        # passthrough columns so a composite pipeline stays one scan
        # instead of re-joining signals back onto the corpus by id
        *passthrough,
    )


def line_dedup(
    df: DataFrame, id_col: str, text_col: str, *,
    min_docs: int = 2, delim: str = "\n", out_col: str = "clean_text",
) -> DataFrame:
    """Remove lines that appear in >= ``min_docs`` distinct documents
    (boilerplate headers/footers/navigation — the CCNet/RefinedWeb
    paragraph-dedup pass), preserving each document's remaining line order.

    Shape: explode lines once, aggregate by md5(line) (narrow 32-byte keys
    instead of raw text on the shuffle), keep only hashes above the
    threshold, anti-join the survivors back, then regroup by doc. The
    frequent-line table is NOT force-broadcast: on a real crawl corpus the
    set of lines shared by >= min_docs documents is unbounded (round-3
    advice — a forced broadcast OOMs at 100 TB), so the join strategy is
    left to the optimizer/AQE, which broadcasts exactly when the runtime
    size is small and falls back to a shuffled anti-join on the 32-byte
    hash otherwise. Docs whose every line is boilerplate come back with an
    empty string (left join on the input), never silently dropped."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    ).withColumn("lh", F.md5("line"))
    boiler = (lines.groupBy("lh")
              .agg(F.count_distinct("id").alias("n_docs"))
              .filter(F.col("n_docs") >= min_docs)
              .select("lh"))
    kept = lines.join(boiler, "lh", "left_anti")
    regrouped = kept.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"]),
            delim).alias(out_col),
        F.count("*").cast("long").alias("n_lines_kept"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return (base.join(regrouped, "id", "left")
            .select("id",
                    F.coalesce(out_col, F.lit("")).alias(out_col),
                    F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept")))
