"""Corpus-cleaning operators (ops/clean.py) and the token-budget sampler:
redaction masks and counts every planted PII span, the quality gate names
its fail reasons, line dedup removes exactly the cross-document lines
while preserving order, and the budget sampler keeps a stable per-group
prefix.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from liresolr_spark.ops.clean import line_dedup, quality_filter, redact_pii
from liresolr_spark.ops.sample import token_budget_sample


def test_redact_pii_counts_and_masks(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.co and c.d@e.org, ip 10.0.0.1, tel 555-867-5309"),
         (2, "no pii here at all"),
         (3, "+1 555 123 4567 calls 192.168.1.1")],
        ["id", "text"])
    rows = {r["id"]: r for r in redact_pii(df, "text").collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (2, 1, 1)
    assert rows[1]["redacted"] == "mail <EMAIL> and <EMAIL>, ip <IP>, tel <PHONE>"
    assert (rows[2]["n_email"], rows[2]["n_ipv4"], rows[2]["n_phone"]) == (0, 0, 0)
    assert rows[2]["redacted"] == rows[2]["text"]
    # the phone pattern must not swallow the already-masked IP
    assert rows[3]["redacted"] == "<PHONE> calls <IP>"


def test_quality_filter_reasons(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["the word value data with"] * 20)),  # passes all
         (2, "tiny doc"),                                   # too_short
         (3, " ".join(["zzzz qqqq vvvv wwww xxxx"] * 20))],  # few_stopwords
        ["id", "text"])
    out = {r["id"]: r for r in
           quality_filter(df, "id", "text", min_tokens=30,
                          min_stopword_ratio=0.04).collect()}
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert not out[2]["keep"] and "too_short" in out[2]["reasons"]
    assert not out[3]["keep"] and out[3]["reasons"] == "few_stopwords"


def test_line_dedup_removes_boilerplate_keeps_order(spark):
    df = spark.createDataFrame(
        [(1, "unique one\nSHARED\nalpha\nFOOTER"),
         (2, "SHARED\nunique two\nFOOTER"),
         (3, "solo body only")],
        ["id", "text"])
    out = {r["id"]: r for r in line_dedup(df, "id", "text").collect()}
    assert out[1]["clean_text"] == "unique one\nalpha"
    assert out[2]["clean_text"] == "unique two"
    assert out[3]["clean_text"] == "solo body only"
    assert out[1]["n_lines_kept"] == 2
    # a doc that is pure boilerplate comes back empty, not missing
    df2 = df.union(spark.createDataFrame([(4, "SHARED\nFOOTER")], ["id", "text"]))
    out2 = {r["id"]: r for r in line_dedup(df2, "id", "text").collect()}
    assert out2[4]["clean_text"] == "" and out2[4]["n_lines_kept"] == 0


def test_token_budget_prefix_stability(spark):
    df = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 4).alias("grp"),
        (F.col("id") % 13 + 5).alias("n_tok"))
    small = token_budget_sample(df, "grp", 100, "n_tok", "id")
    big = token_budget_sample(df, "grp", 300, "n_tok", "id")
    # budget respected: every kept row started before exhaustion
    assert small.filter(F.col("cum_tokens_before") >= 100).count() == 0
    # overshoot bounded by one doc per group
    tot = {r["grp"]: r["s"] for r in
           small.groupBy("grp").agg(F.sum("n_tok").alias("s")).collect()}
    assert all(v < 100 + 18 for v in tot.values())
    # stable prefix: the small pick is a subset of the big pick
    assert small.select("id").exceptAll(big.select("id")).count() == 0
    # determinism under repartitioning
    again = token_budget_sample(df.repartition(11), "grp", 100, "n_tok", "id")
    assert small.select("id").exceptAll(again.select("id")).count() == 0
