"""Vector-set similarity (the SURF all-pairs re-rank analog, ref:
SurfUtils.java:9-62, SurfInterestPoint.java:29-52): exactness vs a numpy
brute force, safe-degeneration of the sorted-norm prune (eps=inf == exact),
and the prune's one-sided error (maxsim never overscores, chamfer never
underscores)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from liresolr_spark.ops.setsim import (
    build_doc_sets,
    set_similarity,
    set_similarity_topk,
)


@pytest.fixture(scope="module")
def sets_and_query(spark):
    rng = np.random.default_rng(11)
    rows = [(int(i), rng.standard_normal(8).astype(float).tolist())
            for i in range(240)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sets = build_doc_sets(emb, (F.col("vec_id") % 12))
    sets.persist().count()
    q = [list(v) for v in
         sets.filter(F.col("set_id") == 2).first()["vectors"]]
    raw = {r["set_id"]: [np.array(v) for v in r["vectors"]]
           for r in sets.collect()}
    return sets, q, raw


def _brute(raw, q, mode):
    Q = np.asarray(q)
    qn = np.linalg.norm(Q, axis=1)
    out = {}
    for sid, vecs in raw.items():
        D = np.stack(vecs)
        dn = np.linalg.norm(D, axis=1)
        if mode == "maxsim":
            sims = (Q @ D.T) / (qn[:, None] * dn[None, :])
            out[sid] = float(np.round(sims.max(axis=1), 6).sum())
        else:
            d2 = ((Q * Q).sum(1)[:, None] - 2 * (Q @ D.T)
                  + (D * D).sum(1)[None, :])
            out[sid] = float(np.round(
                np.sqrt(np.maximum(d2.min(axis=1), 0.0)), 6).mean())
    return out


@pytest.mark.parametrize("mode", ["maxsim", "chamfer"])
def test_exact_matches_numpy_bruteforce(spark, sets_and_query, mode):
    sets, q, raw = sets_and_query
    got = {r["set_id"]: r["score"]
           for r in set_similarity(sets, q, mode=mode).collect()}
    want = _brute(raw, q, mode)
    assert got.keys() == want.keys()
    for sid in want:
        assert abs(got[sid] - want[sid]) < 1e-9, (mode, sid)


@pytest.mark.parametrize("mode", ["maxsim", "chamfer"])
def test_prune_inf_degenerates_to_exact(spark, sets_and_query, mode):
    sets, q, raw = sets_and_query
    exact = set_similarity(sets, q, mode=mode).collect()
    pruned = set_similarity(sets, q, mode=mode, prune_eps=1e9).collect()
    assert sorted((r["set_id"], round(r["score"], 9)) for r in exact) == \
           sorted((r["set_id"], round(r["score"], 9)) for r in pruned)


def test_prune_error_is_one_sided(spark, sets_and_query):
    """The ±eps window only SHRINKS each per-query-vector candidate list:
    maxsim (max over fewer) can only drop, chamfer (min over fewer) can
    only rise — the reference's prune trades recall, never correctness
    direction."""
    sets, q, raw = sets_and_query
    for mode, cmp in (("maxsim", np.less_equal), ("chamfer", np.greater_equal)):
        exact = {r["set_id"]: r["score"]
                 for r in set_similarity(sets, q, mode=mode).collect()}
        pruned = {r["set_id"]: r["score"]
                  for r in set_similarity(sets, q, mode=mode,
                                          prune_eps=0.3).collect()}
        assert all(cmp(pruned[s], exact[s] + (1e-9 if mode == "maxsim"
                                              else -1e-9))
                   for s in exact), mode


def test_topk_total_order(spark, sets_and_query):
    sets, q, _ = sets_and_query
    top = set_similarity_topk(sets, q, k=5, mode="maxsim").collect()
    assert len(top) == 5
    assert top[0]["set_id"] == 2  # the query's own set is its best match
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
