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


class TestHotBlockGuards:
    """Round-3 verdict #7: explicit-block pair ops were quadratic in a hot
    block's size. The guard composes an LSH key into any block above the
    row threshold, so the hazard can't be triggered by a skewed blocking
    column. Contract: small blocks stay EXACT; guarded blocks return a
    SUBSET of the exact pairs (blocking only ever removes candidates) in
    which exact duplicates are always retained."""

    def _corpus(self, spark):
        # one hot group: 3 identical twins + distinct docs
        rows = []
        for i in range(8):
            rows.append((i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i}"))
        for i in range(3):
            rows.append((100 + i, "same same same words every time here now"))
            rows.append((200 + i, "same same same words every time here now"))
        return spark.createDataFrame(
            [(i, t, "g1") for i, t in rows],
            "doc_id long, text string, src string")

    def test_ngram_jaccard_guard_subset_and_exact_dups(self, spark):
        from liresolr_spark.ops.dedup import ngram_jaccard_pairs

        docs = self._corpus(spark)
        exact = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(
                     docs, "doc_id", "text", group_col="src").collect()}
        guarded = {(r["id_a"], r["id_b"]): r["jaccard"]
                   for r in ngram_jaccard_pairs(
                       docs, "doc_id", "text", group_col="src",
                       max_group_rows=4).collect()}
        # subset with identical values
        assert set(guarded) <= set(exact)
        for k, v in guarded.items():
            assert v == exact[k]
        # every exact-duplicate pair (j = 1.0) survives the guard
        dup_pairs = {k for k, v in exact.items() if v == 1.0}
        assert dup_pairs and dup_pairs <= set(guarded)
        # small group (threshold not hit) stays exact
        same = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(
                    docs, "doc_id", "text", group_col="src",
                    max_group_rows=1000).collect()}
        assert same == exact

    def test_neardup_guard_subset_and_exact_dups(self, spark):
        from liresolr_spark.ops.similarity import neardup_pairs

        rows = []
        for i in range(10):  # spread across sign buckets
            v = [(-1.0 if (i >> b) & 1 else 1.0) * (1.0 + 0.01 * i)
                 for b in range(4)]
            rows.append((i, v, "blk"))
        for i in range(3):   # identical twins (same sign bucket by identity)
            rows.append((100 + i, [0.5, 0.5, 0.5, 0.5], "blk"))
            rows.append((200 + i, [0.5, 0.5, 0.5, 0.5], "blk"))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label string")
        exact = {(r["id_a"], r["id_b"]): r["cosine"]
                 for r in neardup_pairs(emb, 0.99).collect()}
        guarded = {(r["id_a"], r["id_b"]): r["cosine"]
                   for r in neardup_pairs(
                       emb, 0.99, max_block_rows=4, bucket_dims=4).collect()}
        assert set(guarded) <= set(exact)
        dup_pairs = {k for k, v in exact.items() if v == 1.0}
        assert dup_pairs and dup_pairs <= set(guarded)


class TestFqAllowCache:
    """SURVEY O5: the fq allow-list cache (CachingWrapperFilter analog) —
    repeated fq strings must reuse ONE cached allow-list DataFrame, results
    must be identical with and without the cache hit, and refresh() must
    drop the cache (per-searcher semantics)."""

    def test_repeated_fq_reuses_allow_list(self, spark, tmp_path):
        from liresolr_spark.api import LireQueryEngine
        from liresolr_spark.plans.build import build_index
        from liresolr_spark.sources.corpus import synthetic_code_corpus

        idx = str(tmp_path / "fqc_idx")
        build_index(synthetic_code_corpus(spark, 200, seed=3), idx,
                    num_shards=4, block_size=64)
        eng = LireQueryEngine(spark, idx)
        fq = "lang = 'python'"
        r1 = eng.search(text="readFile bufPack", fq=fq, rows=5).collect()
        a1 = eng._fq_cache.get(fq)
        r2 = eng.search(text="readFile bufPack", fq=fq, rows=5).collect()
        a2 = eng._fq_cache.get(fq)
        assert a1 is not None and a1 is a2  # same cached DataFrame reused
        assert [(r.docID, r.score) for r in r1] == \
               [(r.docID, r.score) for r in r2]
        assert all(r.lang == "python" for r in r1)
        eng.refresh()
        assert not eng._fq_cache  # searcher reopen drops the filter cache
