"""End-to-end rank identity at 10x the unit-fixture scale (2000 docs):
multi-range shards (real WAND pruning geometry), hot/rare/mixed queries,
both index query paths vs the brute-force oracle, sha256 invariant.

This is the largest corpus the O(n) Python oracle can check quickly; the
bench and scaling harness cover 20k-240k docs for performance only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from liresolr_spark.functions.tokenizer import py_tokenize
from liresolr_spark.operators.bm25 import bm25_topk_from_index
from liresolr_spark.operators.wand import wand_topk
from liresolr_spark.oracle import brute_force_topk

QUERIES = [
    "import return def",                 # hot
    "readFile bufPack dataNode query",   # mixed
    "sortMerge chunk",                   # mid
]


@pytest.fixture(scope="module")
def big(spark, tmp_path_factory):
    from liresolr_spark.plans.build import NATURAL_KEY, build_index
    from liresolr_spark.sources.corpus import assign_doc_ids, synthetic_code_corpus

    corpus = synthetic_code_corpus(spark, 2000, seed=11, partitions=8)
    corpus.persist()
    d = str(tmp_path_factory.mktemp("idx2k"))
    m = build_index(corpus, d, num_shards=8, block_size=128)
    assert m["finished"] and m["n_docs"] <= 2000
    with_ids = assign_doc_ids(corpus, NATURAL_KEY, dedup=True)
    docs_local = [(r["docID"], r["content"])
                  for r in with_ids.select("docID", "content").collect()]
    assert len(docs_local) == m["n_docs"]
    return d, docs_local


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity_2k(spark, big, query):
    d, docs_local = big
    want = brute_force_topk(docs_local, query, k=50)
    stats: dict = {}
    got_w = [(r["docID"], r["score"]) for r in
             wand_topk(spark, d, py_tokenize(query), k=50,
                       stats_out=stats).collect()]
    assert len(got_w) == len(want)
    for (gid, gs), (wid, ws) in zip(got_w, want):
        assert gid == wid
        assert abs(gs - ws) < 1e-9 * max(1.0, abs(ws))
    assert stats["ranges_total"].value > 0

    got_e = [(r["docID"], r["score"]) for r in
             bm25_topk_from_index(spark, d, py_tokenize(query), k=50).collect()]
    assert got_e == got_w


def test_sha256_invariant_2k(spark, big):
    d, docs_local = big
    import hashlib

    stats = {r["docID"]: r["sha256"]
             for r in spark.read.parquet(f"{d}/docstats")
             .select("docID", "sha256").collect()}
    assert len(stats) == len(docs_local)
    for doc_id, content in docs_local[:200]:
        assert stats[doc_id] == hashlib.sha256(content.encode()).hexdigest()
