"""Deterministic sampling and splitting operators for training-data
pipelines: hash-based train/val/test split, stratified per-group quotas,
and target-mixture resampling (domain re-weighting).

No reference analog (Solr has no dataset-split concept; its only sampler
is the random-sort q11 path) — these are the assignment ops every
pretraining pipeline runs before tokenization: carve a held-out split,
cap a runaway domain, hit a target language/domain mixture.

Determinism contract (shared with q11/d02): all "randomness" is the md5
hex digest of a salted id — identical in Spark and DuckDB, stable across
runs/partitionings/cluster sizes, and re-derivable per row (a re-run or a
backfill assigns every doc the same split). Lowercase hex compares
lexicographically = numerically, so thresholds are 8-hex-char strings and
the comparison never leaves codegen'd string ops.

Scale shape: ``hash_split`` and ``mixture_resample`` are pure projections
/ filters — zero shuffle on the 100 TB side; the threshold table of
``mixture_resample`` is a literal CASE (dozens of domains), never a join.
``stratified_quota`` is the only shuffle (one hash partition by stratum);
its per-stratum window is bounded by the stratum size — for hot strata
at extreme scale, pre-filter with ``mixture_resample`` to an upper bound
first, then take the exact quota.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_FULL = 1 << 32


def uniform_hash_hex(id_col: Column, salt: str) -> Column:
    """First 8 hex chars of md5('<salt>:<id>') — uniform over [0, 2^32)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 8)


def hex_threshold(frac: float) -> str:
    """8-hex-char cutoff such that P(hash < cutoff) = frac.

    frac >= 1.0 returns the keep-all sentinel 'g' (> every hex char) rather
    than a clamped 'ffffffff': the clamp would silently drop any row whose
    salted hash is exactly ffffffff — 2^-32 per row, i.e. tens of documents
    on a 10^11-doc corpus, violating the 'kept whole' contract (round-3
    advice)."""
    if frac >= 1.0:
        return "g"
    return format(max(0, min(int(round(frac * _FULL)), _FULL - 1)), "08x")


def hash_split(
    df: DataFrame, id_col: str, weights: dict[str, float],
    salt: str = "split", out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label with the given
    proportions (in expectation). Pure projection — no shuffle, no state;
    a doc's split depends only on (salt, id), so incremental batches and
    full reruns agree row-for-row.

    `weights` preserves insertion order; they must sum to ~1 (the last
    split absorbs rounding)."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights sum to {total}, expected 1")
    h = uniform_hash_hex(F.col(id_col), salt)
    names = list(weights)
    expr, cum = None, 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = h < hex_threshold(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, label)


def stratified_quota(
    df: DataFrame, strata_col: str, n_per_stratum: int,
    id_col: str, salt: str = "quota",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by deterministic
    hash order (a seeded uniform sample without replacement). One shuffle
    (hash partition by stratum); ties broken by id so the pick is total."""
    h = uniform_hash_hex(F.col(id_col), salt)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= n_per_stratum))


def token_budget_sample(
    df: DataFrame, group_col: str, budget: int,
    size_col: str, id_col: str, salt: str = "budget",
) -> DataFrame:
    """Keep documents, in deterministic hash order per group, until each
    group's cumulative ``size_col`` (token count) reaches ``budget`` — the
    "take N tokens per domain" assembly step of a pretraining mix. A doc is
    kept iff the budget was not yet exhausted when its turn came, so every
    group overshoots by at most one document and the pick is a stable
    prefix: raising the budget only ever ADDS documents.

    One shuffle (hash partition by group); the running sum is a bounded
    window per group. For extreme-scale hot groups, pre-thin with
    ``mixture_resample`` to a small multiple of the budget first."""
    h = uniform_hash_hex(F.col(id_col), salt)
    w = (Window.partitionBy(group_col)
         .orderBy(h.asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = F.sum(size_col).over(w) - F.col(size_col)
    return (df.withColumn("cum_tokens_before", cum_before)
            .filter(F.col("cum_tokens_before") < budget))


def mixture_resample(
    df: DataFrame, group_col: str, keep_fracs: dict[str, float],
    id_col: str, salt: str = "mix",
) -> DataFrame:
    """Downsample each group to its target acceptance fraction (domain
    re-weighting): keep a row iff hash(salt, id) < frac[group]. Groups not
    in `keep_fracs` are kept whole. Pure filter — the fraction table is a
    literal CASE chain (domains number in the dozens), so the 100 TB side
    is never joined or shuffled, and the filter is codegen'd."""
    h = uniform_hash_hex(F.col(id_col), salt)
    expr = None
    for grp, frac in keep_fracs.items():
        cond = F.col(group_col) == grp
        thr = F.lit(hex_threshold(frac))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    if expr is None:
        return df
    # 'g' > every hex char: sentinel +inf for unlisted groups (keep all)
    return df.filter(h < expr.otherwise(F.lit("g")))
