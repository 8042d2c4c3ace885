"""Brute-force pure-Python/numpy BM25 oracle for rank-identity tests.

Independent implementation of the engine's scoring spec (Lucene 4.10 BM25,
k1=1.2 b=0.75, exact doc lengths, OR-of-terms sum — ref:
SimilarRequestHandler.java:98) used as the golden reference in pytest
(SURVEY §5.2.2). Shares only the tokenizer spec with the engine; everything
else (tf, df, N, avgdl, scoring, top-k ordering) is recomputed from scratch
with plain dict/Counter arithmetic so a bug in the Spark pipeline cannot
hide in a shared helper.
"""

from __future__ import annotations

from collections import Counter

from liresolr_spark import BM25_B, BM25_K1
from liresolr_spark.functions.tokenizer import py_hash_token, py_tokenize


def brute_force_topk(
    docs: list[tuple[int, str]],
    query: str,
    k: int = 60,
    k1: float = BM25_K1,
    b: float = BM25_B,
    field: str = "text",
) -> list[tuple[int, float]]:
    """docs: [(docID, content)]; returns [(docID, score)] with total order
    (score desc, docID asc), length <= k."""
    import math

    tokenized = {}
    for doc_id, content in docs:
        toks = py_tokenize(content)
        if field == "ha":
            toks = [py_hash_token(t) for t in toks]
        tokenized[doc_id] = toks
    n = len(docs)
    avgdl = sum(len(t) for t in tokenized.values()) / max(n, 1)
    q_toks = py_tokenize(query)
    if field == "ha":
        q_toks = [py_hash_token(t) for t in q_toks]
    q_counts = Counter(q_toks)
    df = {t: sum(1 for toks in tokenized.values() if t in toks) for t in q_counts}
    scores = {}
    for doc_id, toks in tokenized.items():
        tf = Counter(toks)
        s = 0.0
        for t, qtf in q_counts.items():
            if tf[t] == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            dl = len(toks)
            s += qtf * idf * tf[t] * (k1 + 1.0) / (
                tf[t] + k1 * (1.0 - b + b * dl / avgdl))
        if s > 0.0:
            scores[doc_id] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
