"""Distributed block-max WAND top-k BM25 over the compressed block index.

Execution model = the Solr sharded collection (ref: AddImages.java:46
`media_shard1_replica1`): the query fans out to every docID-range shard,
each shard runs a block-max top-k kernel locally over its own posting
blocks, and the per-shard top-k's merge to a global top-k — exactly how a
SolrCloud query distributes LireRequestHandler's candidate search
(ref: LireRequestHandler.java:458) across shards.

Within a shard the kernel exploits ALIGNED blocks (block_seq = docID //
block_size for every term, see plans/build._block_builder):

  1. upper bound per docID range r:  UB(r) = sum_t idf_t * max_tf_norm(t, r)
  2. visit ranges in DESCENDING UB order, maintaining the running top-k
     threshold theta (k-th best exact score);
  3. stop as soon as UB(next) <= theta — no remaining range can beat the
     heap. Ranges never visited are never decoded (the WAND saving).
  4. visited ranges are scored exactly & vectorized: decode delta+varint,
     accumulate sum_t idf_t * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) via
     np.bincount on shard-local docIDs.

This is a SAFE optimization: results are exactly the exhaustive top-k
(property-tested in tests/test_wand.py), unlike the reference's lossy
candidate cap of 20000 (LireRequestHandler.java:59).

Spark plan: blocks are partition-pruned to the query's terms (parquet
row-group stats on `term`); the kernel runs as applyInPandas grouped by
shard — one Arrow batch per shard, no driver-side posting materialization,
no shuffle of raw postings. Doclens travel INSIDE each block (codec third
stream, the analog of Lucene per-segment norms), so a query's input is
proportional to the posting lists of its terms — it never scans a
corpus-sized doc-stats table (critical at 10^12 docs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from liresolr_spark.functions.codec import decode_block
from liresolr_spark.operators.bm25 import idf_lucene
from liresolr_spark.plans.build import read_meta


def _mask_from_pdf(mask_pdf: pd.DataFrame | None, allow_mode: bool):
    """Per-shard docID restriction from a cogrouped (docID, allow) frame.

    Returns (allow_sorted | None, deny_sorted | None). allow_mode=True means
    an allow-list is ACTIVE globally (fq pushdown): a shard with zero allow
    rows then matches nothing — an empty sorted array, not None."""
    allow = deny = None
    if mask_pdf is not None and len(mask_pdf):
        ids = mask_pdf["docID"].values.astype(np.int64)
        flags = mask_pdf["allow"].values.astype(bool)
        if allow_mode:
            allow = np.sort(ids[flags])
        if (~flags).any():
            deny = np.sort(ids[~flags])
    elif allow_mode:
        allow = np.empty(0, dtype=np.int64)
    return allow, deny


def _apply_mask(ids, scores, allow, deny):
    if allow is None and deny is None:
        return ids, scores
    keep = np.ones(len(ids), dtype=bool)
    if allow is not None:
        keep &= np.isin(ids, allow)
    if deny is not None:
        keep &= ~np.isin(ids, deny)
    return ids[keep], scores[keep]


def _shard_kernel(idf: dict, k: int, k1: float, b: float, avgdl: float,
                  block_size: int, acc_total=None, acc_visited=None,
                  allow_mode: bool = False):
    """Returns the applyInPandas kernel: (shard's query-term blocks) -> topk.

    acc_total/acc_visited: optional Spark accumulators counting aligned
    docID ranges considered vs actually decoded — the observable WAND
    saving (ranges never visited are never decompressed).

    The kernel optionally takes a second frame (docID, allow) — the
    cogrouped per-shard docID restriction. allow=True rows form an fq
    allow-list (pushed-down filter query: top-k is then exact UNDER the
    filter, ref fq semantics LireRequestHandler.java:539-550); allow=False
    rows are tombstones (docs superseded by a cross-segment overwrite,
    excluded from results but still counted in df/avgdl until compaction —
    exactly Lucene's deleted-docs statistics behavior). Masking happens
    BEFORE the running top-k/theta update, so a filtered doc can never
    displace an eligible one; the block upper bounds remain valid bounds
    for the masked subset, so WAND pruning stays safe."""

    def kernel(blocks: pd.DataFrame, mask_pdf: pd.DataFrame | None = None
               ) -> pd.DataFrame:
        allow, deny = _mask_from_pdf(mask_pdf, allow_mode)
        if len(blocks) == 0:
            return pd.DataFrame({"docID": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        terms = blocks["term"].values
        seqs = blocks["block_seq"].values.astype(np.int64)
        w = np.array([idf[t] for t in terms], dtype=np.float64)
        # avgdl-independent block bound: tf_norm is increasing in tf,
        # decreasing in dl, so tf_norm(max_tf, min_dl) >= every posting's
        # contribution — stays a valid upper bound after segment appends
        # shift the global avgdl (stored max_tf_norm is exact only for the
        # segment's build-time avgdl)
        mtf = blocks["max_tf"].values.astype(np.float64)
        mdl = blocks["min_dl"].values.astype(np.float64)
        ub_contrib = w * mtf * (k1 + 1.0) / (
            mtf + k1 * (1.0 - b + b * mdl / avgdl))

        # UB per aligned range
        uniq_seq, inv = np.unique(seqs, return_inverse=True)
        ub = np.bincount(inv, weights=ub_contrib)
        visit_order = np.argsort(-ub, kind="stable")
        # group block rows by range ONCE (argsort + offsets): members of
        # range ri are a contiguous slice — keeps the visit loop
        # O(blocks log blocks), not O(ranges * blocks)
        grp = np.argsort(inv, kind="stable")
        counts = np.bincount(inv, minlength=len(uniq_seq))
        offsets = np.concatenate(([0], np.cumsum(counts)))

        top_ids = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.float64)
        theta = -np.inf

        docid_col = blocks["docids"].values
        tf_col = blocks["tfs"].values
        dl_col = blocks["doclens"].values

        visited = 0
        for ri in visit_order:
            # prune on STRICT inequality: a range whose bound exactly ties
            # theta may still hold a doc with score == theta and a smaller
            # docID, which outranks the current k-th under the total order
            # (score desc, docID asc)
            if len(top_ids) >= k and ub[ri] < theta:
                break  # no remaining range can beat the k-th result
            visited += 1
            members = grp[offsets[ri]:offsets[ri + 1]]
            ids_all, sc_all = [], []
            for m in members:
                ids, tfs, dls_u = decode_block(
                    bytes(docid_col[m]), bytes(tf_col[m]), bytes(dl_col[m]))
                ids = ids.astype(np.int64)
                tf_f = tfs.astype(np.float64)
                dls = dls_u.astype(np.float64)
                sc = w[m] * tf_f * (k1 + 1.0) / (
                    tf_f + k1 * (1.0 - b + b * dls / avgdl))
                ids_all.append(ids)
                sc_all.append(sc)
            ids_cat = np.concatenate(ids_all)
            sc_cat = np.concatenate(sc_all)
            # restriction BEFORE the heap/theta update: a filtered doc must
            # never occupy a top-k slot or raise theta
            ids_cat, sc_cat = _apply_mask(ids_cat, sc_cat, allow, deny)
            if not len(ids_cat):
                continue
            # accumulate per docID within the range (range is small: <= block_size docs)
            lo = ids_cat.min()
            acc = np.bincount(ids_cat - lo, weights=sc_cat)
            nz = np.nonzero(acc)[0]
            new_ids = nz + lo
            new_scores = acc[nz]
            # merge into running top-k with total order (score desc, docID asc)
            top_ids = np.concatenate([top_ids, new_ids])
            top_scores = np.concatenate([top_scores, new_scores])
            order = np.lexsort((top_ids, -top_scores))[:k]
            top_ids, top_scores = top_ids[order], top_scores[order]
            if len(top_ids) >= k:
                theta = top_scores[-1]

        if acc_total is not None:
            acc_total.add(int(len(uniq_seq)))
            acc_visited.add(int(visited))
        return pd.DataFrame({"docID": top_ids, "score": top_scores})

    return kernel


def _shard_kernel_many(idfs: dict, k: int, k1: float, b: float, avgdl: float,
                       allow_mode: bool = False):
    """Batched variant: Q queries against one shard's blocks in a single
    kernel invocation. Each block is DECODED AT MOST ONCE across all queries
    (memoized) — hot terms shared by many queries amortize to one
    decompression — and WAND range-pruning still applies per query.

    Optional second frame = per-shard docID restriction (see _shard_kernel);
    it is query-independent, so the mask is applied once inside the decode
    memo and shared by every query."""

    def kernel(blocks: pd.DataFrame, mask_pdf: pd.DataFrame | None = None
               ) -> pd.DataFrame:
        allow, deny = _mask_from_pdf(mask_pdf, allow_mode)
        empty = pd.DataFrame({"qid": pd.Series(dtype="object"),
                              "docID": pd.Series(dtype="int64"),
                              "score": pd.Series(dtype="float64")})
        if len(blocks) == 0:
            return empty
        terms = blocks["term"].values
        seqs = blocks["block_seq"].values.astype(np.int64)
        mtf = blocks["max_tf"].values.astype(np.float64)
        mdl = blocks["min_dl"].values.astype(np.float64)
        # idf-free part of the block bound (see _shard_kernel notes)
        bound_base = mtf * (k1 + 1.0) / (mtf + k1 * (1.0 - b + b * mdl / avgdl))

        uniq_seq, inv = np.unique(seqs, return_inverse=True)
        grp = np.argsort(inv, kind="stable")
        counts = np.bincount(inv, minlength=len(uniq_seq))
        offsets = np.concatenate(([0], np.cumsum(counts)))

        docid_col = blocks["docids"].values
        tf_col = blocks["tfs"].values
        dl_col = blocks["doclens"].values
        decoded: dict[int, tuple] = {}  # row -> (ids, tf_norm_part) cache

        def decode(m: int):
            hit = decoded.get(m)
            if hit is None:
                ids, tfs, dls_u = decode_block(
                    bytes(docid_col[m]), bytes(tf_col[m]), bytes(dl_col[m]))
                tf_f = tfs.astype(np.float64)
                dls = dls_u.astype(np.float64)
                # idf-free per-posting contribution; a query scales it by w
                part = tf_f * (k1 + 1.0) / (
                    tf_f + k1 * (1.0 - b + b * dls / avgdl))
                ids_m, part_m = _apply_mask(
                    ids.astype(np.int64), part, allow, deny)
                hit = (ids_m, part_m)
                decoded[m] = hit
            return hit

        # factorize terms ONCE per shard: a query's weight vector is then a
        # vectorized gather over its per-unique-term idf table, O(U + R)
        # instead of O(R) Python dict lookups per query
        uniq_terms, term_codes = np.unique(terms, return_inverse=True)

        out = []
        for qid, idf in idfs.items():
            tw = np.array([idf.get(t, 0.0) for t in uniq_terms],
                          dtype=np.float64)
            if not tw.any():
                continue  # no overlap between this query and the shard
            w = tw[term_codes]
            ub = np.bincount(inv, weights=w * bound_base,
                             minlength=len(uniq_seq))
            visit_order = np.argsort(-ub, kind="stable")
            top_ids = np.empty(0, dtype=np.int64)
            top_scores = np.empty(0, dtype=np.float64)
            theta = -np.inf
            for ri in visit_order:
                if ub[ri] <= 0.0 or (len(top_ids) >= k and ub[ri] < theta):
                    break  # strict: an exact tie may hold a smaller docID
                ids_all, sc_all = [], []
                for m in grp[offsets[ri]:offsets[ri + 1]]:
                    if w[m] == 0.0:
                        continue  # block belongs to another query's term
                    ids, part = decode(m)
                    ids_all.append(ids)
                    sc_all.append(w[m] * part)
                if not ids_all:
                    continue
                ids_cat = np.concatenate(ids_all)
                sc_cat = np.concatenate(sc_all)
                if not len(ids_cat):  # every posting masked out
                    continue
                lo = ids_cat.min()
                acc = np.bincount(ids_cat - lo, weights=sc_cat)
                nz = np.nonzero(acc)[0]
                top_ids = np.concatenate([top_ids, nz + lo])
                top_scores = np.concatenate([top_scores, acc[nz]])
                order = np.lexsort((top_ids, -top_scores))[:k]
                top_ids, top_scores = top_ids[order], top_scores[order]
                if len(top_ids) >= k:
                    theta = top_scores[-1]
            if len(top_ids):
                out.append(pd.DataFrame({
                    "qid": qid, "docID": top_ids, "score": top_scores}))
        return pd.concat(out, ignore_index=True) if out else empty

    return kernel


def _restrict_df(allow_docids: DataFrame | None,
                 deny_docids: DataFrame | None) -> DataFrame | None:
    """Combine optional allow (fq) / deny (tombstone) docID sets into ONE
    (shard, docID, allow) frame for the cogrouped kernel. Scale note: the
    deny side is tiny (only superseded docs); the allow side is proportional
    to fq selectivity — the pushdown is meant for SELECTIVE filters, exactly
    the case the post-filter silently breaks. At 10^12 docs an unselective
    fq would instead use a per-shard bitmap artifact; the cogroup seam stays
    the same."""
    out = None
    if allow_docids is not None:
        out = allow_docids.select("shard", "docID", F.lit(True).alias("allow"))
    if deny_docids is not None:
        d = deny_docids.select("shard", "docID", F.lit(False).alias("allow"))
        out = d if out is None else out.unionByName(d)
    return out


def wand_topk_many(
    spark: SparkSession,
    index_dir: str,
    queries: dict[str, list[str]],
    k: int = 60,
    field: str = "text",
    blocks_df: DataFrame | None = None,
    dictionary_df: DataFrame | None = None,
    dictionary_map: dict | None = None,
    meta=None,
    allow_docids: DataFrame | None = None,
    deny_docids: DataFrame | None = None,
) -> DataFrame:
    """Batched block-max WAND: ALL queries answered in ONE distributed job.

    Returns DataFrame(qid, docID, score) — each qid's rows are its exact
    top-k under (score desc, docID asc). This is the serving-throughput
    path: per-job overhead (scheduling, Python worker round-trip, shuffle
    setup) is paid once for the whole batch instead of per query, and the
    kernel decodes each hot block once for every query that touches it.
    queries: {query_id: [terms...]}."""
    from collections import Counter

    from pyspark.sql.window import Window

    meta = meta or read_meta(index_dir)
    if dictionary_map is not None:
        dmap = dictionary_map.get(field, {})
    else:
        all_terms = sorted({t for ts in queries.values() for t in ts})
        dictionary = (dictionary_df if dictionary_df is not None
                      else spark.read.parquet(f"{index_dir}/dictionary"))
        rows = (
            dictionary.filter((F.col("field") == field)
                              & F.col("term").isin(all_terms))
            .groupBy("term").agg(F.sum("df").alias("df")).collect()
        )
        dmap = {r["term"]: int(r["df"]) for r in rows}
    idfs = {}
    for qid, terms in queries.items():
        qtf = Counter(terms)
        m = {t: idf_lucene(meta.n_docs, dmap[t]) * n
             for t, n in qtf.items() if t in dmap}
        if m:
            idfs[qid] = m
    if not idfs:
        return spark.createDataFrame([], "qid string, docID long, score double")
    union_terms = sorted({t for m in idfs.values() for t in m})

    src = (blocks_df if blocks_df is not None
           else spark.read.parquet(f"{index_dir}/blocks"))
    blocks = src.filter(
        (F.col("field") == field) & F.col("term").isin(union_terms)
    ).select("shard", "term", "block_seq", "docids", "tfs", "doclens",
             "max_tf", "min_dl")

    kernel = _shard_kernel_many(idfs, k, meta.k1, meta.b, meta.avgdl,
                                allow_mode=allow_docids is not None)
    schema = "qid string, docID long, score double"
    restrict = _restrict_df(allow_docids, deny_docids)
    if restrict is None:
        per_shard = blocks.groupBy("shard").applyInPandas(
            lambda bl: kernel(bl), schema=schema)
    else:
        per_shard = blocks.groupBy("shard").cogroup(
            restrict.groupBy("shard")
        ).applyInPandas(lambda bl, mk: kernel(bl, mk), schema=schema)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docID"))
    return (per_shard.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def wand_topk(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = 60,
    field: str = "text",
    blocks_df: DataFrame | None = None,
    dictionary_df: DataFrame | None = None,
    dictionary_map: dict | None = None,
    meta=None,
    stats_out: dict | None = None,
    allow_docids: DataFrame | None = None,
    deny_docids: DataFrame | None = None,
) -> DataFrame:
    """Block-max WAND top-k: returns DataFrame(docID, score), globally exact.

    allow_docids / deny_docids: optional (shard, docID) restriction frames,
    cogrouped into the shard kernel. allow = pushed-down fq (top-k is exact
    UNDER the filter — no candidate-pool recall loss); deny = tombstoned
    docs (cross-segment overwrites). See _shard_kernel.

    blocks_df / dictionary_df / meta: optional pre-loaded handles (a serving
    layer caches these once per index — repeated queries then skip file
    listing and footer reads). dictionary_map, if given, is a driver-side
    {field: {term: df}} snapshot: idf is then computed WITHOUT any Spark job,
    leaving exactly ONE job per query (the pruned block scan) — the hot
    serving path. stats_out, if given, receives 'ranges_total' /
    'ranges_visited' accumulators, valid AFTER the returned DataFrame is
    acted on — the measured WAND pruning saving."""
    from collections import Counter

    meta = meta or read_meta(index_dir)
    qtf = Counter(query_terms)
    if dictionary_map is not None:
        dmap = dictionary_map.get(field, {})
        idf = {t: idf_lucene(meta.n_docs, dmap[t]) * n
               for t, n in qtf.items() if t in dmap}
    else:
        # sum df across dictionary fragments: appended segments each add one
        # (the Lucene multi-segment term-dictionary merge)
        dictionary = (dictionary_df if dictionary_df is not None
                      else spark.read.parquet(f"{index_dir}/dictionary"))
        dstats = (
            dictionary.filter((F.col("field") == field)
                              & F.col("term").isin(list(qtf)))
            .groupBy("term").agg(F.sum("df").alias("df")).collect()
        )
        idf = {r["term"]: idf_lucene(meta.n_docs, r["df"]) * qtf[r["term"]]
               for r in dstats}
    if not idf:
        return spark.createDataFrame([], "docID long, score double")

    # partition pruning on shard dirs is automatic; row-group stats prune term
    src = (blocks_df if blocks_df is not None
           else spark.read.parquet(f"{index_dir}/blocks"))
    blocks = src.filter(
        (F.col("field") == field) & F.col("term").isin(list(idf))
    ).select("shard", "term", "block_seq", "docids", "tfs", "doclens",
             "max_tf", "min_dl")

    acc_total = acc_visited = None
    if stats_out is not None:
        acc_total = spark.sparkContext.accumulator(0)
        acc_visited = spark.sparkContext.accumulator(0)
        stats_out["ranges_total"] = acc_total
        stats_out["ranges_visited"] = acc_visited

    kernel = _shard_kernel(idf, k, meta.k1, meta.b, meta.avgdl,
                           meta.block_size, acc_total, acc_visited,
                           allow_mode=allow_docids is not None)
    schema = "docID long, score double"
    restrict = _restrict_df(allow_docids, deny_docids)
    if restrict is None:
        per_shard = blocks.groupBy("shard").applyInPandas(
            lambda bl: kernel(bl), schema=schema)
    else:
        per_shard = blocks.groupBy("shard").cogroup(
            restrict.groupBy("shard")
        ).applyInPandas(lambda bl, mk: kernel(bl, mk), schema=schema)
    # global merge: bounded heap per partition + driver merge (TakeOrderedAndProject)
    return per_shard.orderBy(F.desc("score"), F.asc("docID")).limit(k)
