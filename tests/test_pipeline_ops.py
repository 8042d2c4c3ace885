"""Edge-case tests for the round-3 pipeline ops: benchmark decontamination
and Gopher-style repetition scores (the oracle entries d08/t05 cover the
bulk semantics; these pin the degenerate inputs the synthetic corpus
doesn't exercise)."""

from __future__ import annotations

import pytest

from liresolr_spark.ops.dedup import decontaminate
from liresolr_spark.ops.text import repetition_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontaminate:
    def test_overlap_counts_and_flags(self, spark):
        corpus = _docs(spark, [
            (1, "alpha beta gamma delta"),        # shares 2 shingles w/ bench
            (2, "one two three four five"),       # disjoint
            (3, "alpha beta gamma"),              # shares 1 shingle
        ])
        bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
        out = {r["id"]: r for r in
               decontaminate(corpus, bench, "doc_id", "text",
                             shingle_n=3).collect()}
        assert out[1]["n_overlap"] == 2 and out[1]["contaminated"]
        assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]
        assert out[3]["n_overlap"] == 1 and out[3]["contaminated"]

    def test_min_overlap_threshold(self, spark):
        corpus = _docs(spark, [(1, "alpha beta gamma delta")])
        bench = _docs(spark, [(100, "alpha beta gamma delta")])
        out = decontaminate(corpus, bench, "doc_id", "text",
                            shingle_n=3, min_overlap=3).collect()[0]
        assert out["n_overlap"] == 2 and not out["contaminated"]

    def test_short_and_empty_docs_retained(self, spark):
        # docs below shingle_n tokens produce no shingles -> never flagged,
        # but MUST still appear in the verdict (total keep/drop list)
        corpus = _docs(spark, [(1, "alpha"), (2, "")])
        bench = _docs(spark, [(100, "alpha beta gamma")])
        rows = {r["id"]: r for r in
                decontaminate(corpus, bench, "doc_id", "text").collect()}
        assert set(rows) == {1, 2}
        assert all(not r["contaminated"] for r in rows.values())


class TestRepetitionScores:
    def test_duplicate_lines_and_token_mass(self, spark):
        text = "foo bar\nfoo bar\nbaz qux"
        out = repetition_scores(
            _docs(spark, [(1, text)]), "doc_id", "text").collect()[0]
        assert out["n_lines"] == 3
        assert out["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-4)
        # tokens: foo bar foo bar baz qux -> top token 2/6
        assert out["top_token_frac"] == pytest.approx(2 / 6, abs=1e-4)
        # bigrams: (foo bar)(bar foo)(foo bar)(bar baz)(baz qux) -> 2/5
        assert out["top_bigram_frac"] == pytest.approx(2 / 5, abs=1e-4)

    def test_degenerate_repetition_scores_high(self, spark):
        out = repetition_scores(
            _docs(spark, [(1, "spam spam spam spam")]),
            "doc_id", "text").collect()[0]
        assert out["top_token_frac"] == 1.0
        assert out["top_bigram_frac"] == 1.0
        assert out["n_lines"] == 1 and out["dup_line_frac"] == 0.0

    def test_empty_and_single_token_docs(self, spark):
        rows = {r["id"]: r for r in repetition_scores(
            _docs(spark, [(1, ""), (2, "lonely")]),
            "doc_id", "text").collect()}
        e, s = rows[1], rows[2]
        assert e["n_lines"] == 0 and e["dup_line_frac"] == 0.0
        assert e["top_token_frac"] == 0.0 and e["top_bigram_frac"] == 0.0
        assert s["top_token_frac"] == 1.0 and s["top_bigram_frac"] == 0.0
