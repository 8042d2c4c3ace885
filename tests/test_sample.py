"""Deterministic sampling/splitting operators (ops/sample.py): split
assignment is a pure row-wise function of (salt, id) — stable across
reruns, partitionings and incremental batches — quotas are exact, and
mixture fractions land near target.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from liresolr_spark.ops.sample import (
    hash_split, hex_threshold, mixture_resample, stratified_quota)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"))


def test_hash_split_proportions_and_determinism(spark, ids):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    counts = {r["split"]: r["n"] for r in
              hash_split(ids, "id", w).groupBy("split")
              .agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(w)
    for name, frac in w.items():
        assert abs(counts[name] / 5000 - frac) < 0.03
    # re-run on a different partitioning: identical per-row labels
    a = hash_split(ids, "id", w).select("id", "split")
    b = hash_split(ids.repartition(13), "id", w).select("id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # different salt => different assignment (not the same fixed labels)
    c = hash_split(ids, "id", w, salt="other").select("id", "split")
    assert a.exceptAll(c).count() > 0


def test_hash_split_rejects_bad_weights(spark, ids):
    with pytest.raises(ValueError):
        hash_split(ids, "id", {"a": 0.5, "b": 0.2})


def test_stratified_quota_exact_and_stable(spark, ids):
    out = stratified_quota(ids, "grp", 10, "id")
    per = {r["grp"]: r["n"] for r in
           out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert set(per) == set(range(7)) and all(v == 10 for v in per.values())
    # a stratum smaller than the quota returns whole
    small = ids.filter((F.col("id") < 3) | (F.col("grp") != 0))
    n0 = (stratified_quota(small.filter(F.col("grp") == 0), "grp", 10, "id")
          .count())
    assert n0 == 1  # grp 0 has only id 0 below 3 with id%7==0
    # determinism: same pick set on a repartitioned input
    again = stratified_quota(ids.repartition(17), "grp", 10, "id")
    assert (out.select("id").exceptAll(again.select("id")).count() == 0)


def test_mixture_resample_fracs_and_drop(spark, ids):
    assert mixture_resample(ids, "grp", {}, "id").count() == 5000
    ids_s = ids.withColumn("grp", F.col("grp").cast("string"))
    out = mixture_resample(ids_s, "grp", {"0": 0.5, "1": 0.0}, "id")
    per = {r["grp"]: r["n"] for r in
           out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert "1" not in per                       # frac 0 drops the group
    assert abs(per["0"] / (5000 / 7) - 0.5) < 0.1
    for g in ("2", "3", "4", "5", "6"):         # unlisted: kept whole
        assert per[g] in (714, 715)


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "00000000"
    # frac >= 1.0 must be the keep-all sentinel, NOT a clamped 'ffffffff':
    # the clamp silently dropped rows whose salted hash is exactly ffffffff
    assert hex_threshold(1.0) == "g"
    assert hex_threshold(1.5) == "g"
    assert hex_threshold(0.5) == "80000000"
    # just below 1.0 still yields a real hex cutoff
    assert hex_threshold(1.0 - 2**-33) == "ffffffff"


def test_mixture_resample_explicit_full_keep(spark, ids):
    """An explicit keep fraction of 1.0 must keep the group WHOLE —
    identical to not listing the group at all (round-3 advice)."""
    ids_s = ids.withColumn("grp", F.col("grp").cast("string"))
    out = mixture_resample(ids_s, "grp", {"0": 1.0, "1": 0.5}, "id")
    full = ids_s.filter(F.col("grp") == "0").count()
    assert out.filter(F.col("grp") == "0").count() == full
