"""Composite pretraining-mix assembly (ops/assemble.py): each stage's
effect is observable in the final assignment table — quality drops junk,
dedup keeps one copy, decontamination drops eval-overlapping docs, the
budget bounds per-group tokens, and every survivor gets a split label.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from liresolr_spark.ops.assemble import pretraining_mix

GOOD = ("the data value with scan for merge table the row batch key part "
        "hash query index window group order join filter agg column ")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, "g" + str(i % 2), GOOD + f"unique token{i} tail{i}"))
    rows.append((100, "g0", GOOD + "unique token7 tail7"))   # dup of doc 7
    rows.append((101, "g0", "tiny junk"))                    # fails quality
    rows.append((102, "g1", GOOD + "eval marker alpha beta gamma delta"))
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


@pytest.fixture(scope="module")
def bench(spark):
    # shares 3-gram shingles with doc 102 only
    return spark.createDataFrame(
        [(0, "eval marker alpha beta gamma")], ["bid", "text"])


def test_stage_semantics(spark, corpus, bench):
    out = pretraining_mix(
        corpus, bench, "doc_id", "text", "source",
        min_tokens=10, min_stopword_ratio=0.0,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
    ).collect()
    ids = {r["id"] for r in out}
    assert 101 not in ids          # quality gate
    assert 102 not in ids          # decontaminated
    assert (7 in ids) != (100 in ids)  # exactly one of the dup pair
    assert 7 in ids                # min-id keeper wins
    assert all(r["split"] in ("train", "val", "test") for r in out)
    assert all(r["n_tokens"] > 0 for r in out)


def test_budget_bounds_groups(spark, corpus, bench):
    out = pretraining_mix(
        corpus, bench, "doc_id", "text", "source",
        min_tokens=10, budget=100)
    per = {r["group"]: r["s"] for r in
           out.groupBy("group").agg(F.sum("n_tokens").alias("s")).collect()}
    # budget respected up to one-doc overshoot (docs here are ~25 tokens)
    assert all(v < 100 + 30 for v in per.values())
    assert set(per) == {"g0", "g1"}
    # no split weights => constant 'all' label
    assert out.filter(F.col("split") != "all").count() == 0
