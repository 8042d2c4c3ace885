"""Oracle-checked query registry: every operator from SURVEY.md §2 expressed
twice — once as a Spark DataFrame pipeline (built-in expressions only, so the
whole plan stays JVM-side) and once as ANSI SQL DuckDB runs on the same
parquet tables. The driver executes both at sf=0.01 and compares row count,
schema, and value hashes; this registry is therefore the engine's
correctness gate.

Conventions for cross-engine determinism:
- every float is round(x, 4) in BOTH engines, and ordering keys use the
  rounded value with a doc_id tie-break so top-k boundaries agree;
- aggregates/computed columns share the same alias on both sides;
- no engine-specific randomness: "random" sampling orders by md5(id).

The corpus analog here is the driver's `documents` table
(doc_id, text, lang, source, n_chars); `embeddings` (vec_id, embedding,
label) backs the similarity-search operators; TPC-H-ish tables back the
generic relational operators.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from liresolr_spark import BM25_B, BM25_K1
from liresolr_spark.functions.tokenizer import (
    py_tokenize,
    tokenize_expr,
    tokenize_sql_duckdb,
)
from liresolr_spark.operators.bm25 import bm25_scores_all

# ---------------------------------------------------------------------------
# fixed query workload (the "reference query set" analog, FIXTURES.md §2)
# ---------------------------------------------------------------------------

FLAGSHIP_QUERY = "merge sort join window"
FQ_QUERY = "hash join table scan"
HOT_QUERY = "the a data"            # hot skewed terms
K_DEFAULT = 60                      # ref: LireRequestHandler.java:48 rows=60


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _terms_values_sql(terms: list[str]) -> str:
    from collections import Counter

    c = Counter(terms)
    vals = ", ".join(f"('{t}', {n})" for t, n in c.items())
    return f"(VALUES {vals}) AS q(term, qtf)"


TOK = tokenize_sql_duckdb("text")


def _bm25_sql(query: str, k: int, fq_where: str = "", extra_from: str = "documents") -> str:
    """DuckDB BM25 with global stats + optional candidate filter (fq)."""
    terms = py_tokenize(query)
    qvals = _terms_values_sql(terms)
    fq_clause = f"WHERE {fq_where}" if fq_where else ""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({TOK}) AS term FROM {extra_from}
),
dl AS (SELECT doc_id, count(*) AS doclen FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(doclen) AS avgdl FROM dl),
q AS (SELECT * FROM {qvals}),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df
          FROM tok JOIN q USING (term) GROUP BY term),
cand AS (SELECT t.doc_id, t.term, count(*) AS tf
         FROM tok t JOIN q USING (term)
         JOIN documents d ON d.doc_id = t.doc_id
         {fq_clause}
         GROUP BY t.doc_id, t.term),
scored AS (
  SELECT c.doc_id,
         sum(q.qtf
             * ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
             * c.tf * ({BM25_K1} + 1)
             / (c.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.doclen / s.avgdl))
         ) AS score
  FROM cand c
  JOIN dfreq f USING (term) JOIN q USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY c.doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY round(score, 4) DESC, doc_id
LIMIT {k}
"""


def _bm25_spark(spark, sf_dir, query: str, k: int, fq=None) -> DataFrame:
    docs = _docs(spark, sf_dir)
    scored = bm25_scores_all(
        docs, py_tokenize(query), doc_id_col="doc_id", text_col="text", fq=fq
    )
    return (
        scored.select(F.col("docID").alias("doc_id"),
                      F.round("score", 4).alias("score"))
        .orderBy(F.desc(F.round(F.col("score"), 4)), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# registry: name -> (spark_fn, oracle_sql | None)
# ---------------------------------------------------------------------------

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# ---- core retrieval (SURVEY §2: J1/A1/A2, T1-T6, P1-P6) --------------------

@_reg("q01_bm25_topk", _bm25_sql(FLAGSHIP_QUERY, K_DEFAULT))
def q01(spark, sf_dir):
    """Flagship: OR-of-terms BM25 top-k (ref: /lireq main path,
    LireRequestHandler.java:379-424 + SimilarRequestHandler.java:98 BM25)."""
    return _bm25_spark(spark, sf_dir, FLAGSHIP_QUERY, K_DEFAULT)


@_reg("q02_bm25_fq", _bm25_sql(FQ_QUERY, K_DEFAULT, fq_where="d.lang = 'en'"))
def q02(spark, sf_dir):
    """BM25 with filter query restricting candidates, stats global
    (ref: fq handling LireRequestHandler.java:539-550)."""
    return _bm25_spark(spark, sf_dir, FQ_QUERY, K_DEFAULT, fq=F.col("lang") == "en")


@_reg("q03_bm25_hot_terms", _bm25_sql(HOT_QUERY, 100))
def q03(spark, sf_dir):
    """BM25 over deliberately hot (high-df) terms — the skew stress path."""
    return _bm25_spark(spark, sf_dir, HOT_QUERY, 100)


@_reg(
    "q04_overlap_candidates",
    f"""
WITH tok AS (SELECT doc_id, unnest({TOK}) AS term FROM documents),
q AS (SELECT * FROM {_terms_values_sql(py_tokenize(FLAGSHIP_QUERY))})
SELECT doc_id, count(DISTINCT term) AS overlap
FROM tok JOIN q USING (term)
GROUP BY doc_id
ORDER BY overlap DESC, doc_id
LIMIT 100
""",
)
def q04(spark, sf_dir):
    """Candidate ranking by number of matching query terms — the coord/
    hash-overlap count of the default-similarity path (ref: SHOULD-query
    scoring, LireRequestHandler.java:407-415,576-592)."""
    docs = _docs(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(t,) for t in set(py_tokenize(FLAGSHIP_QUERY))], "term string")
    posting = docs.select(
        "doc_id", F.explode(tokenize_expr(F.col("text"))).alias("term"))
    return (
        posting.join(broadcast(qdf), "term")
        .groupBy("doc_id").agg(F.countDistinct("term").alias("overlap"))
        .orderBy(F.desc("overlap"), F.asc("doc_id")).limit(100)
    )


@_reg(
    "q05_postings_tf",
    f"""
WITH tok AS (SELECT doc_id, unnest({TOK}) AS term FROM documents),
q AS (SELECT * FROM {_terms_values_sql(py_tokenize(FLAGSHIP_QUERY))})
SELECT term, doc_id, count(*) AS tf
FROM tok JOIN q USING (term)
GROUP BY term, doc_id
ORDER BY term, doc_id
LIMIT 500
""",
)
def q05(spark, sf_dir):
    """The postings relation itself: (term, docID, tf) — index-time tf
    (ref: Lucene tf from repeated _ha tokens, ParallelSolrIndexer.java:459-472)."""
    docs = _docs(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(t,) for t in set(py_tokenize(FLAGSHIP_QUERY))], "term string")
    posting = docs.select(
        "doc_id", F.explode(tokenize_expr(F.col("text"))).alias("term"))
    return (
        posting.join(broadcast(qdf), "term")
        .groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
        .orderBy("term", "doc_id").limit(500)
    )


@_reg(
    "q06_dictionary_df",
    f"""
WITH tok AS (SELECT doc_id, unnest({TOK}) AS term FROM documents),
q AS (SELECT * FROM {_terms_values_sql(py_tokenize(FLAGSHIP_QUERY + " " + HOT_QUERY))})
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
FROM tok JOIN q USING (term)
GROUP BY term
ORDER BY term
""",
)
def q06(spark, sf_dir):
    """Dictionary stats: df + total tf per term (ref: Lucene term dictionary,
    consumed by idf — SURVEY A4)."""
    docs = _docs(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(t,) for t in set(py_tokenize(FLAGSHIP_QUERY + " " + HOT_QUERY))],
        "term string")
    posting = docs.select(
        "doc_id", F.explode(tokenize_expr(F.col("text"))).alias("term"))
    return (
        posting.join(broadcast(qdf), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("total_tf"))
        .orderBy("term")
    )


@_reg(
    "q07_doclen_stats",
    f"""
WITH tok AS (SELECT doc_id, unnest({TOK}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS doclen FROM tok GROUP BY doc_id)
SELECT d.lang, count(*) AS n_docs, round(avg(dl.doclen), 4) AS avgdl,
       max(dl.doclen) AS max_doclen
FROM dl JOIN documents d USING (doc_id)
GROUP BY d.lang
ORDER BY d.lang
""",
)
def q07(spark, sf_dir):
    """Per-group corpus statistics (N, avgdl — SURVEY A4/A5)."""
    docs = _docs(spark, sf_dir)
    dl = docs.select(
        "doc_id", "lang", F.size(tokenize_expr(F.col("text"))).alias("doclen"))
    return (
        dl.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.round(F.avg("doclen"), 4).alias("avgdl"),
             F.max("doclen").alias("max_doclen"))
        .orderBy("lang")
    )


@_reg(
    "q08_point_lookup",
    "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42",
)
def q08(spark, sf_dir):
    """Unique-key point lookup (ref: TermQuery on id,
    LireRequestHandler.java:144 — SURVEY P2)."""
    return (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") == 42)
        .select("doc_id", "lang", "source", "n_chars")
    )


@_reg(
    "q09_pagination",
    f"""
WITH ranked AS (
  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM ({_bm25_sql(FLAGSHIP_QUERY, 1000).replace(';', '').strip()}) )
SELECT doc_id, score, rank FROM ranked
WHERE rank BETWEEN 11 AND 20
ORDER BY rank
""",
)
def q09(spark, sf_dir):
    """Pagination slice start=10 rows=10 (ref: LireRequestHandler.java:519-528
    — SURVEY T3)."""
    from pyspark.sql.window import Window

    top = _bm25_spark(spark, sf_dir, FLAGSHIP_QUERY, 1000)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank").between(11, 20))
        .orderBy("rank")
    )


@_reg(
    "q10_function_sort",
    """
SELECT doc_id, abs(n_chars - 1000) AS dist
FROM documents
ORDER BY dist ASC, doc_id
LIMIT 20
""",
)
def q10(spark, sf_dir):
    """Sort by a per-doc function value — the lirefunc sort analog
    (ref: sort=lirefunc(...) README.md:204-212, LireValueSource.java:85-109
    — SURVEY T4)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.abs(F.col("n_chars") - 1000).alias("dist"))
        .orderBy(F.asc("dist"), F.asc("doc_id"))
        .limit(20)
    )


@_reg(
    "q11_random_sample",
    """
SELECT doc_id, lang
FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
LIMIT 30
""",
)
def q11(spark, sf_dir):
    """Deterministic random sample: order by md5(id) — the seeded version of
    the reference's Math.random() doc picker (ref:
    LireRequestHandler.java:207-232 — SURVEY T6; we fix the seed by hashing)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .limit(30)
    )


@_reg(
    "q12_extract_tokens",
    f"""
WITH tok AS (
  SELECT unnest({tokenize_sql_duckdb("'parseHTTPResponse snake_case_id MergeSortJoin'")}) AS token
)
SELECT token, substr(md5(token), 1, 8) AS ha, count(*) AS n
FROM tok GROUP BY token ORDER BY token
""",
)
def q12(spark, sf_dir):
    """The extract endpoint analog: tokenize + hash a supplied string, no
    index touch (ref: handleExtract LireRequestHandler.java:318-368 — F6)."""
    one = spark.range(1).select(
        F.explode(
            tokenize_expr(F.lit("parseHTTPResponse snake_case_id MergeSortJoin"))
        ).alias("token")
    )
    return (
        one.withColumn("ha", F.substring(F.md5("token"), 1, 8))
        .groupBy("token", "ha").agg(F.count("*").alias("n"))
        .orderBy("token")
    )


# ---- generic relational coverage (scans/joins/aggs on TPC-H-ish tables) ----

@_reg(
    "r01_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def r01(spark, sf_dir):
    """TPC-H Q1-style aggregation (partial+final hash agg; generic A-ops)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_reg(
    "r02_top_customers",
    """
SELECT c.c_custkey, n.n_name,
       round(sum(o.o_totalprice), 4) AS revenue, count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 25
""",
)
def r02(spark, sf_dir):
    """Multi-join + agg + top-n: broadcast the small dims (customer, nation)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"),
             F.count("*").alias("n_orders"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(25)
    )


@_reg(
    "r03_events_daily",
    """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
""",
)
def r03(spark, sf_dir):
    """Tumbling daily window over the events stream table (batch analog of
    the streaming rollup; SURVEY §2.8)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
