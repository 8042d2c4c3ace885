"""Rank-identity end-to-end (SURVEY §5.2.2, north_rule): the Spark engine's
BM25 top-k (docID, score) must be rank-identical to the brute-force
pure-Python oracle over the synthetic corpus, on every path:

  1. index-free DataFrame scoring (bm25_score_corpus)
  2. block-index DataFrame scoring (bm25_topk_from_index)
  3. distributed block-max WAND (wand_topk)

Plus: Murmur3 hex-token equivalence between Spark's hash() and the
pure-Python Java-semantics reference, and the md5 hash-token family.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from liresolr_spark.functions.tokenizer import (
    murmur_hash_tokens_expr,
    py_hash_token,
    py_hash_token_murmur,
    py_tokenize,
    tokenize_expr,
)
from liresolr_spark.operators.bm25 import bm25_score_corpus
from liresolr_spark.oracle import brute_force_topk

QUERIES = [
    "readFile bufPack",
    "import return",                      # hot skewed terms
    "dataNode hash_map sortMerge query",  # camel + snake mix
    "zzz_does_not_exist",                 # zero-hit
    "import import tokenBlock",           # repeated query term (qtf > 1)
]


@pytest.fixture(scope="module")
def indexed(spark, corpus200, tmp_path_factory):
    from liresolr_spark.plans.build import build_index

    d = str(tmp_path_factory.mktemp("index"))
    metrics = build_index(corpus200, d, num_shards=8, block_size=64)
    assert metrics["finished"]
    return d


@pytest.fixture(scope="module")
def docs_local(spark, corpus200):
    """Collected (docID, content) with the engine's own docID assignment —
    oracle recomputes everything else from scratch."""
    from liresolr_spark.plans.build import NATURAL_KEY
    from liresolr_spark.sources.corpus import assign_doc_ids

    with_ids = assign_doc_ids(corpus200, NATURAL_KEY)
    rows = with_ids.select("docID", "content").collect()
    return [(r["docID"], r["content"]) for r in rows]


def _assert_rank_identical(got, want, tol=1e-9):
    assert len(got) == len(want), f"lengths differ: {len(got)} vs {len(want)}"
    for i, ((gid, gs), (wid, ws)) in enumerate(zip(got, want)):
        assert gid == wid, f"rank {i}: docID {gid} != {wid}"
        assert abs(gs - ws) < tol * max(1.0, abs(ws)), f"rank {i}: {gs} != {ws}"


@pytest.mark.parametrize("query", QUERIES)
def test_dataframe_path_rank_identity(spark, corpus200, docs_local, query):
    from liresolr_spark.plans.build import NATURAL_KEY
    from liresolr_spark.sources.corpus import assign_doc_ids

    want = brute_force_topk(docs_local, query, k=20)
    with_ids = assign_doc_ids(corpus200, NATURAL_KEY)
    got_df = bm25_score_corpus(with_ids, py_tokenize(query), k=20)
    got = [(r["docID"], r["score"]) for r in got_df.collect()]
    _assert_rank_identical(got, want)


@pytest.mark.parametrize("query", QUERIES)
def test_index_paths_rank_identity(spark, indexed, docs_local, query):
    from liresolr_spark.operators.bm25 import bm25_topk_from_index
    from liresolr_spark.operators.wand import wand_topk

    want = brute_force_topk(docs_local, query, k=20)
    terms = py_tokenize(query)

    got_df = bm25_topk_from_index(spark, indexed, terms, k=20)
    got = [(r["docID"], r["score"]) for r in got_df.collect()]
    _assert_rank_identical(got, want)

    got_w = wand_topk(spark, indexed, terms, k=20)
    got = [(r["docID"], r["score"]) for r in got_w.collect()]
    _assert_rank_identical(got, want)


def test_hash_field_rank_identity(spark, indexed, docs_local):
    """The `ha` hash-token family (liresolr's `_ha` analog) scores identically
    through the index as through the oracle's hashed tokens."""
    from liresolr_spark.operators.wand import wand_topk

    query = "readFile bufPack dataNode"
    want = brute_force_topk(docs_local, query, k=15, field="ha")
    terms = [py_hash_token(t) for t in py_tokenize(query)]
    got_w = wand_topk(spark, indexed, terms, k=15, field="ha")
    got = [(r["docID"], r["score"]) for r in got_w.collect()]
    _assert_rank_identical(got, want)


def test_sha256_invariant(spark, indexed, corpus200):
    """Per-row invariant (input_hint): sha256(content) in docstats equals the
    input table's, for every doc."""
    stats = spark.read.parquet(f"{indexed}/docstats")
    inp = corpus200.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("sha_in")
    ).dropDuplicates(["repo", "path", "commit"])
    joined = stats.join(inp, ["repo", "path", "commit"], "left")
    bad = joined.filter(
        (F.col("sha_in").isNull()) | (F.col("sha256") != F.col("sha_in"))
    ).count()
    assert bad == 0
    assert stats.count() == inp.count()


def test_murmur_hex_tokens_match_java_semantics(spark):
    toks = ["import", "return", "fooBar", "x", "readFile", "éclair", "a1b2"]
    df = spark.createDataFrame([(t,) for t in toks], "content string")
    out = df.select(
        F.col("content"),
        murmur_hash_tokens_expr(tokenize_expr(F.col("content"))).alias("hex"),
    ).collect()
    for r in out:
        want = [py_hash_token_murmur(t) for t in py_tokenize(r["content"])]
        assert r["hex"] == want, (r["content"], r["hex"], want)


def test_md5_hash_tokens_cross_engine(spark):
    from liresolr_spark.functions.tokenizer import hash_tokens_expr

    df = spark.createDataFrame([("importFoo bar_baz",)], "content string")
    row = df.select(
        hash_tokens_expr(tokenize_expr(F.col("content"))).alias("ha")
    ).first()
    assert row["ha"] == [py_hash_token(t) for t in py_tokenize("importFoo bar_baz")]
