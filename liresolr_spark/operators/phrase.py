"""Exact phrase query over the block index + corpus (two-stage AND/verify).

Lucene answers PhraseQuery from term POSITIONS stored in the postings.
This index deliberately stores none — its per-doc payload is the content
sha256 (the north-rule per-row invariant), not the content — so phrase
matching runs as the classic two-stage plan a positionless index forces:

  1. CANDIDATES from the index: docs containing ALL phrase terms, computed
     per shard by intersecting the terms' posting lists (term-pruned block
     scan -> Arrow decode -> sorted-array intersection inside one
     applyInPandas kernel per shard; no posting shuffle — postings of one
     doc live in one shard by construction, shard = docID range).
  2. VERIFY + SCORE on the candidate set only: candidates join back to the
     corpus by natural key and the phrase frequency is computed from the
     re-tokenized content with pure built-in string expressions.

Every doc containing the phrase contains all its terms, so stage 1 is a
strict superset and the result is EXACT — including the phrase df (count
of verified docs), which makes the scores identical to an index-free
recompute (gated by the q18/w04 DuckDB oracle).

Scoring: the phrase is ONE BM25 clause whose tf is the number of
occurrences of the consecutive token sequence — Lucene's PhraseQuery
semantics (phrase frequency feeds the same tf normalization,
ExactPhraseMatcher feeding into the standard similarity). Occurrences are
counted NON-OVERLAPPING left-to-right (the `length - length(replace(...))`
string kernel, identical in Spark and the DuckDB oracle); this differs
from Lucene's sliding positional count only for self-overlapping phrases
("a a" inside "a a a": 1 here, 2 in Lucene) — a documented deviation taken
so both engines compute the same pure-SQL-expressible function.

Scale shape: stage 1 touches only the phrase terms' posting blocks. Stage
2 is two scans joined against the bounded candidate set — docstats (natural
keys of candidates) and the corpus (content of candidates); neither join
shuffles the big side when the candidate set broadcasts, and the optimizer
decides that by size (NOT forced: a stop-word phrase's candidate set is as
big as its rarest term's postings, and a forced broadcast of an unbounded
side is an OOM at 10^12 docs). A corpus whose phrase traffic matters would
store positions index-side; the seam for that is stage 1's kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from liresolr_spark.functions.codec import decode_block
from liresolr_spark.functions.tokenizer import py_tokenize, tokenize_expr
from liresolr_spark.plans.build import NATURAL_KEY, read_meta


def conjunctive_docids(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    field: str = "text",
    blocks_df: DataFrame | None = None,
    meta=None,
) -> DataFrame:
    """DataFrame(shard, docID) of docs whose `field` contains EVERY term —
    the boolean-AND candidate set, from posting-list intersection.

    Per shard (one Arrow batch, same dispatch as the WAND kernel): decode
    each term's docID stream (blocks are docID-sorted and block_seq-ordered,
    so per-term concatenation is already sorted), then intersect smallest
    list first so the working set only shrinks. A term absent from a shard
    empties that shard; absent from every shard -> empty result."""
    uniq = sorted(set(terms))
    if not uniq:
        return spark.createDataFrame([], "shard int, docID long")
    meta = meta or read_meta(index_dir)
    src = (blocks_df if blocks_df is not None
           else spark.read.parquet(f"{index_dir}/blocks"))
    blocks = src.filter(
        (F.col("field") == field) & F.col("term").isin(uniq)
    ).select("shard", "term", "block_seq", "docids")
    n_required = len(uniq)

    def kernel(bl: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"shard": pd.Series(dtype="int32"),
                              "docID": pd.Series(dtype="int64")})
        if len(bl) == 0 or bl["term"].nunique() < n_required:
            return empty
        shard = int(bl["shard"].iloc[0])
        # block-range pre-intersection (the block-max-WAND flavored saving):
        # blocks are ALIGNED docID ranges, so a doc in the AND result can
        # only live in a block_seq present for EVERY term — decode nothing
        # outside that range set. A rare+hot phrase then decodes only the
        # hot term's blocks that overlap the rare term's, not its full
        # posting list.
        seq_sets = [set(g["block_seq"]) for _, g in
                    bl.groupby("term", sort=False)]
        live = set.intersection(*seq_sets)
        if not live:
            return empty
        bl = bl[bl["block_seq"].isin(live)]
        bl = bl.sort_values("block_seq", kind="stable")
        per_term = []
        for _, grp in bl.groupby("term", sort=False):
            ids = np.concatenate([
                decode_block(bytes(d), b"", b"")[0].astype(np.int64)
                for d in grp["docids"].values])
            per_term.append(ids)
        per_term.sort(key=len)
        cur = per_term[0]
        for ids in per_term[1:]:
            if not len(cur):
                return empty
            # both sides sorted & unique (docIDs unique within a term)
            cur = np.intersect1d(cur, ids, assume_unique=True)
        if not len(cur):
            return empty
        return pd.DataFrame({"shard": np.full(len(cur), shard, dtype="int32"),
                             "docID": cur})

    from liresolr_spark.operators.wand import _run_shard_kernel

    return _run_shard_kernel(
        spark, blocks, kernel, "shard int, docID long", meta.num_shards)


def phrase_scores(
    docs: DataFrame,
    phrase: str,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    content_col: str = "content",
    doclen_col: Column | None = None,
    cache_out: list | None = None,
) -> DataFrame:
    """Append exact phrase-BM25 columns to `docs`: tf (phrase frequency,
    rows with tf=0 dropped) and score. df is the verified match count,
    computed INSIDE the plan (1-row aggregate cross-joined back — no second
    action). Index-free callers pass the corpus itself; the index path
    passes the candidate set (the df is identical either way because
    candidates ⊇ matches).

    cache_out: the matched set has TWO consumers (scoring and the df
    aggregate) and Catalyst cannot reuse the subtree between them — without
    a cache the whole verify pipeline (block scan, intersection kernel,
    corpus join, tokenize) runs twice (seen in .explain: duplicated
    subtrees under both BroadcastExchanges). Pass a list and the matched
    relation — persisted NARROW, content dropped after tf is computed — is
    appended to it; release after the consuming action
    (operators.bm25.materialize_and_release does both). cache_out=None is
    the leak-proof double-pass default, same contract as
    bm25_scores_all."""
    terms = py_tokenize(phrase)
    if not terms:
        return docs.filter(F.lit(False)).withColumn(
            "tf", F.lit(0).cast("long")).withColumn("score", F.lit(0.0))
    # STAGED projections (the CollapseProject lesson from ops/clean.py's
    # quality gate): inlining the tf expression into filter + score
    # re-evaluates tokenize + array_join + replace once per reference —
    # measured 12.0s vs 4.9s staged on a 20k-doc hot phrase at local[32].
    # Stage 1 materializes the token array once; stage 2 the joined string
    # (non-cheap, multiply-referenced aliases — exactly the condition under
    # which the optimizer preserves the projection split); the match filter
    # is a single `contains` scan (tf >= 1 ⟺ contains), and the tf replace
    # pass runs only over the surviving rows.
    needle = " " + " ".join(terms) + " "
    passthrough = [c for c in docs.columns if c != content_col]
    toked = docs.select(
        *passthrough, tokenize_expr(F.col(content_col)).alias("_toks"))
    staged = toked.select(
        *passthrough,
        (doclen_col if doclen_col is not None
         else F.size("_toks")).cast("double").alias("_dl"),
        F.concat(F.lit(" "), F.array_join("_toks", " "),
                 F.lit(" ")).alias("_js"),
    )
    tf = (
        (F.length("_js")
         - F.length(F.replace(F.col("_js"), F.lit(needle), F.lit(""))))
        / F.length(F.lit(needle))
    ).cast("long")
    matched = (
        staged.filter(F.col("_js").contains(needle))
        .select(*passthrough, F.col("_dl"), tf.alias("tf"))
    )
    if cache_out is not None:
        matched = matched.persist()
        cache_out.append(matched)
    dfc = matched.agg(F.count("*").alias("_df_phrase"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("_df_phrase") + 0.5)
                / (F.col("_df_phrase") + 0.5))
    tf = F.col("tf").cast("double")
    return (
        matched.crossJoin(dfc)
        .withColumn(
            "score",
            idf * tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("_dl") / F.lit(float(avgdl)))))
        .drop("_df_phrase", "_dl")
    )


def phrase_topk(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    phrase: str,
    k: int = 60,
    field: str = "text",
    content_col: str = "content",
    blocks_df: DataFrame | None = None,
    meta=None,
    allow_docids: DataFrame | None = None,
    deny_docids: DataFrame | None = None,
    cache_out: list | None = None,
) -> DataFrame:
    """Exact phrase top-k through the index: DataFrame(docID, score), the
    verified phrase matches ranked by phrase-BM25 (score DESC, docID ASC).

    corpus: the indexed source (NATURAL_KEY + content) — the verify stage
    reads content from here; the index stores only sha256 (see module
    docstring). allow_docids / deny_docids: the same (shard, docID)
    restriction frames as wand_topk (fq pushdown / tombstones), applied to
    the candidate set before any content is touched. cache_out: see
    phrase_scores — without it the verify pipeline runs twice (once for
    scores, once for the phrase df)."""
    terms = py_tokenize(phrase)
    if not terms:
        return spark.createDataFrame([], "docID long, score double")
    meta = meta or read_meta(index_dir)
    cand = conjunctive_docids(spark, index_dir, terms, field=field,
                              blocks_df=blocks_df, meta=meta)
    if allow_docids is not None:
        cand = cand.join(allow_docids.select("shard", "docID"),
                         ["shard", "docID"])
    if deny_docids is not None:
        cand = cand.join(deny_docids.select("shard", "docID"),
                         ["shard", "docID"], "left_anti")
    stats = spark.read.parquet(f"{index_dir}/docstats").select(
        "shard", "docID", "doclen", "sha256", *NATURAL_KEY)
    # the sha256 equality pin (the north-rule per-row invariant, stored in
    # docstats at build time) keeps the verify honest under duplicate
    # natural keys in the corpus: the build keeps one winner per key
    # (assign_doc_ids dedup), and without the pin the content join could
    # fan out to — and verify against — a LOSING duplicate's content
    keyed = (
        cand.join(stats, ["shard", "docID"])
        .join(corpus.select(*NATURAL_KEY, content_col), NATURAL_KEY)
        .filter(F.sha2(F.col(content_col), 256) == F.col("sha256"))
        .drop("sha256")
    )
    scored = phrase_scores(
        keyed, phrase, meta.n_docs, meta.avgdl, meta.k1, meta.b,
        content_col=content_col, doclen_col=F.col("doclen"),
        cache_out=cache_out)
    return (
        scored.select("docID", "score")
        .orderBy(F.desc("score"), F.asc("docID"))
        .limit(k)
    )
