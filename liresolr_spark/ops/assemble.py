"""End-to-end pretraining-mix assembly: the composite pipeline a
training-data user actually runs, chaining the individual operators this
package provides — quality gate, exact dedup, benchmark decontamination,
per-domain token budget, train/val/test split — into one DataFrame plan.

No reference analog (the reference is a search engine; this is the
data-curation workflow built on top of the same primitives). The value of
the composite is (a) proving the stage operators compose without
collect()/driver round-trips, and (b) pinning the canonical stage ORDER:
quality first (cheapest row-wise gate drops rows before anything
shuffles), then dedup (so budget counts a doc once), then decontamination
(eval overlap checked on the deduped survivors), then budget, then split
(pure projection, last so every earlier stage is split-agnostic).

Scale shape: one corpus scan feeds the whole chain. Shuffles: the dedup
window (keyed md5(text) — duplicate groups are small, so no hot
partition), the decontamination overlap count (keyed id, uniform), and
the budget window (keyed domain). The benchmark shingle set is broadcast;
the split adds no shuffle. Everything else is codegen'd projection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from liresolr_spark.ops.clean import quality_filter
from liresolr_spark.ops.dedup import decontaminate
from liresolr_spark.ops.sample import hash_split, token_budget_sample


def pretraining_mix(
    df: DataFrame, bench_df: DataFrame,
    id_col: str, text_col: str, group_col: str, *,
    min_tokens: int = 30, min_stopword_ratio: float = 0.0,
    shingle_n: int = 3, min_overlap: int = 1,
    budget: int | None = None,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Assemble a training mix from a raw corpus and a held-out benchmark.

    Returns one row per SURVIVING document:
    ``(id, group, n_tokens, split)`` — the assignment table a tokenizer
    job joins against. ``split`` is 'all' when no weights are given."""
    q = quality_filter(
        df, id_col, text_col,
        min_tokens=min_tokens, min_stopword_ratio=min_stopword_ratio,
        keep_cols=[group_col, text_col],
    ).filter("keep").select(
        "id", F.col(group_col).alias("group"), F.col(text_col).alias("text"),
        "n_tokens")

    # exact dedup: keep the min-id doc of each identical-content group.
    # Window (not agg+join) so the survivors keep their columns in one pass.
    w = Window.partitionBy(F.md5("text")).orderBy(F.col("id").asc())
    deduped = (q.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1).drop("rn"))

    dec = decontaminate(deduped, bench_df, "id", "text",
                        shingle_n=shingle_n, min_overlap=min_overlap)
    clean = deduped.join(
        dec.filter(~F.col("contaminated")).select("id"), "id")

    sized = clean.select("id", "group", "n_tokens")
    if budget is not None:
        sized = token_budget_sample(
            sized, "group", budget, "n_tokens", "id"
        ).drop("cum_tokens_before")
    if split_weights:
        sized = hash_split(sized, "id", split_weights)
    else:
        sized = sized.withColumn("split", F.lit("all"))
    return sized.select("id", "group", "n_tokens", "split")
