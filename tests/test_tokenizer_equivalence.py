"""The tokenizer is the index/query contract (ref: LireRequestHandler.java:409
"hash functions must match"): its three implementations — Spark expression,
DuckDB SQL (the correctness oracle), pure Python (the pytest oracle) — must
produce identical token lists on arbitrary input.

Randomized (seeded) strings over a hostile alphabet: camelCase, acronym
runs, snake_case, digits, punctuation runs, unicode, whitespace shapes,
empty/separator-only strings.
"""

from __future__ import annotations

import random
import string

import duckdb
import pyspark.sql.functions as F

from liresolr_spark.functions.tokenizer import (
    py_hash_token,
    py_tokenize,
    tokenize_expr,
    tokenize_sql_duckdb,
    hash_token_sql_duckdb,
)

ALPHA = (
    list(string.ascii_letters) + list(string.digits)
    + list(" \t\n_-./+*(){}[]<>!@#$%^&=;:'\",?|\\`~")
    + ["é", "ß", "中", "🙂"]
)
WORDS = ["parseHTTPResponse", "XMLHttpRequest", "snake_case_id", "v2Beta",
         "READFILE", "a", "A", "x9y", "__init__", "camelCase", "UPPERlower"]


def _cases(n: int = 300, seed: int = 99) -> list[str]:
    rng = random.Random(seed)
    out = ["", " ", "___", "\n\t", "🙂🙂", "a", "A9b"]
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(1, 12)):
            if rng.random() < 0.4:
                parts.append(rng.choice(WORDS))
            else:
                parts.append("".join(rng.choice(ALPHA)
                                     for _ in range(rng.randint(1, 10))))
        out.append(rng.choice(["", " ", "-", "_"]).join(parts))
    return out


def test_spark_expr_matches_python(spark):
    cases = _cases()
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)],
                               "i long, content string")
    rows = df.select("i", tokenize_expr(F.col("content")).alias("t")) \
             .orderBy("i").collect()
    for r, s in zip(rows, cases):
        assert r["t"] == py_tokenize(s), (repr(s), r["t"], py_tokenize(s))


def test_duckdb_sql_matches_python():
    cases = _cases()
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, ?)" for i in range(len(cases)))
                + ") v(i, content)", cases)
    rows = con.execute(
        f"SELECT i, {tokenize_sql_duckdb('content')} AS toks "
        "FROM t ORDER BY i").fetchall()
    for (i, toks), s in zip(rows, cases):
        assert list(toks) == py_tokenize(s), (repr(s), toks, py_tokenize(s))


def test_hash_token_three_way(spark):
    toks = ["read", "file", "Éclair".lower(), "x9", "zebraquux"]
    # python vs duckdb
    con = duckdb.connect()
    for t in toks:
        got = con.execute(
            f"SELECT {hash_token_sql_duckdb('?')}", [t]).fetchone()[0]
        assert got == py_hash_token(t)
    # python vs spark
    from liresolr_spark.functions.tokenizer import hash_tokens_expr

    row = spark.createDataFrame([(toks,)], "toks array<string>") \
        .select(hash_tokens_expr(F.col("toks")).alias("h")).first()
    assert row["h"] == [py_hash_token(t) for t in toks]
