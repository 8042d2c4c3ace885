"""Segment merge / compaction — the Lucene background-merge analog.

The reference never manages segments itself: `commitWithin=1000` on the
Solr sink (ref: scripts/add_histograms.py:40) lets Lucene merge the
micro-batch segments in the background, bounding segment count and
physically dropping deleted (overwritten) docs. Our append path
(streaming.ingest.append_segment) has the same failure mode Lucene merges
exist to fix: every micro-batch adds `shard=` dirs, a dictionary `seg=`
fragment, and possibly tombstones — unbounded, the per-shard WAND fan-out
degrades, and superseded docs keep distorting df/N/avgdl.

`compact_index` rewrites an appended index into a fresh, single-segment
index with exact statistics:

  1. live docs   = docstats MINUS tombstoned docIDs (overwrite semantics
                   were decided at append time; compaction just applies
                   them physically);
  2. renumber    = dense new docIDs by old-docID rank (assign_doc_ids'
                   two-pass scheme — deterministic, no global window), new
                   docID-range shards sized to `num_shards`;
  3. postings    = decode every block back to (field, term, docID, tf,
                   doclen) — vectorized mapInArrow, the codec in reverse —
                   drop tombstoned postings, remap docIDs (shuffle join on
                   docID, the only corpus-sized shuffle), and re-run the
                   SAME block builder as the batch build (delta+varint,
                   aligned block_seq, WAND bounds) under the recomputed
                   avgdl;
  4. artifacts   = fresh docstats / blocks / manifest / dictionary(seg=0),
                   meta.json written LAST as the commit point, with the
                   streaming epoch ledger carried over so a checkpointed
                   ingest can keep appending after compaction.

Rank identity: a compacted index answers every query exactly like a
from-scratch build over the surviving docs (pytest-gated) — statistics are
recomputed from live docs only, so the Lucene deleted-docs df drift ends
here, just like a real merge.

Scale shape: everything is DataFrame + the existing Arrow kernels; the
decode pass reads only the block streams (no content — compaction never
needs the original corpus), the docID remap is an equi-join, and block
rebuild reuses the adaptive group-salt bound. Output lands in `out_dir`
(a complete new index); `in_place=True` swaps directories afterwards —
atomic enough for the single-writer local layout, and on a real deployment
the swap is an Iceberg snapshot commit / HDFS dir rename.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from liresolr_spark import BM25_B, BM25_K1
from liresolr_spark.plans.build import (
    BLOCK_SCHEMA,
    TARGET_GROUP_ROWS,
    IndexMeta,
    _block_builder,
    _paths,
    load_tombstones,
    read_meta,
    write_meta,
)


def _decoded_postings(blocks_df):
    """blocks -> (field, term, docID, tf, doclen) rows, vectorized decode.

    One Arrow batch of block rows expands to its postings with numpy
    concatenation + np.repeat for the term column — no per-posting Python.
    """
    import pandas as pd

    from liresolr_spark.functions.codec import decode_block

    def explode(batches):
        for pdf in batches:
            ids_l, tfs_l, dls_l, terms_l, fields_l = [], [], [], [], []
            for field, term, d, t, ln in zip(
                pdf["field"], pdf["term"], pdf["docids"], pdf["tfs"],
                pdf["doclens"],
            ):
                ids, tfs, dls = decode_block(bytes(d), bytes(t), bytes(ln))
                n = len(ids)
                ids_l.append(ids.astype(np.int64))
                tfs_l.append(tfs.astype(np.int64))
                dls_l.append(dls.astype(np.int64))
                terms_l.append(np.repeat(term, n))
                fields_l.append(np.repeat(field, n))
            if not ids_l:
                yield pd.DataFrame({
                    "field": pd.Series(dtype="object"),
                    "term": pd.Series(dtype="object"),
                    "docID": pd.Series(dtype="int64"),
                    "tf": pd.Series(dtype="int64"),
                    "doclen": pd.Series(dtype="int64")})
                continue
            yield pd.DataFrame({
                "field": np.concatenate(fields_l),
                "term": np.concatenate(terms_l),
                "docID": np.concatenate(ids_l),
                "tf": np.concatenate(tfs_l),
                "doclen": np.concatenate(dls_l),
            })

    return blocks_df.select("field", "term", "docids", "tfs", "doclens") \
        .mapInPandas(explode,
                     schema="field string, term string, docID long, "
                            "tf long, doclen long")


def compact_index(
    spark: SparkSession,
    index_dir: str,
    out_dir: str | None = None,
    num_shards: int | None = None,
    block_size: int | None = None,
    in_place: bool = False,
    group_salts: int | None = None,
) -> dict:
    """Merge all segments of `index_dir` into a fresh index at `out_dir`
    (default `<index_dir>.compact`), dropping tombstoned docs and
    recomputing exact global statistics. Returns a metrics dict.

    in_place=True: after the new index fully commits, swap it over
    `index_dir` (old artifacts removed). Single-writer only — pause ingest
    around the swap; restart-safety comes from the new index being fully
    committed (meta.json last) before the old one is touched.
    """
    import time

    t0 = time.time()
    out = out_dir or (index_dir.rstrip("/") + ".compact")
    meta = read_meta(index_dir)
    p_in = _paths(index_dir)
    p_out = _paths(out)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    docstats = spark.read.parquet(p_in["docstats"])
    tombs = load_tombstones(spark, index_dir)
    dropped = (tombs.select("docID").distinct()
               if tombs is not None else None)
    live = docstats
    if dropped is not None:
        live = live.join(dropped, "docID", "left_anti")

    # dense renumbering by old-docID rank: deterministic, window-free
    # (assign_doc_ids' two-pass scheme over the single key old_docID)
    from liresolr_spark.sources.corpus import assign_doc_ids

    relabeled = live.withColumnRenamed("docID", "old_docID") \
        .withColumnRenamed("shard", "old_shard")
    mapped = assign_doc_ids(relabeled, keys=["old_docID"], cache=True)
    cache_handle = mapped._lsr_cached_part

    row = mapped.agg(F.count("*").alias("n"),
                     F.sum("doclen").alias("s")).first()
    n_docs = int(row["n"])
    total_doclen = float(row["s"] or 0.0)
    if n_docs == 0:
        raise ValueError("compaction would produce an empty index")
    avgdl = total_doclen / n_docs
    n_shards = num_shards or meta.num_shards
    blk = block_size or meta.block_size
    docs_per_shard = max(1, -(-n_docs // n_shards))

    mapped = mapped.withColumn(
        "shard", (F.col("docID") / F.lit(docs_per_shard)).cast("int"))

    new_docstats = mapped.select(
        "docID", "shard", "repo", "path", "commit", "lang", "doclen",
        "sha256")
    new_docstats.write.mode("overwrite").partitionBy("shard") \
        .parquet(p_out["docstats"])

    # postings: decode -> remap docIDs -> rebuild blocks under the new avgdl
    postings = _decoded_postings(spark.read.parquet(p_in["blocks"]))
    id_map = mapped.select(
        F.col("old_docID").alias("docID"),
        F.col("docID").alias("new_docID"), "shard")
    remapped = (
        postings.join(id_map, "docID")  # inner join drops tombstoned postings
        .select("shard", "field", "term",
                F.col("new_docID").alias("docID"), "tf", "doclen")
    )

    if group_salts is None:
        per_group = total_doclen / max(n_shards, 1)
        group_salts = max(1, int(-(-per_group // TARGET_GROUP_ROWS)))
    builder = _block_builder(blk, BM25_K1, BM25_B, avgdl)
    if group_salts > 1:
        salted = remapped.withColumn(
            "gsalt", F.pmod(F.xxhash64("term"), F.lit(group_salts)).cast("int"))
        blocks = salted.groupBy("shard", "field", "gsalt").applyInArrow(
            builder, schema=BLOCK_SCHEMA)
    else:
        blocks = remapped.groupBy("shard", "field").applyInArrow(
            builder, schema=BLOCK_SCHEMA)
    (blocks.sortWithinPartitions("field", "term", "block_seq")
     .write.partitionBy("shard").mode("overwrite").parquet(p_out["blocks"]))

    all_blocks = spark.read.parquet(p_out["blocks"])
    manifest = (
        all_blocks.groupBy("shard").agg(
            F.min("term").alias("term_lo"),
            F.max("term").alias("term_hi"),
            F.sum(F.length("docids") + F.length("tfs")
                  + F.length("doclens")).alias("bytes_written"))
        .join(new_docstats.groupBy("shard")
              .agg(F.count("*").alias("docs_indexed")), "shard", "full")
        .withColumn("status", F.lit("done"))
    )
    manifest.write.mode("overwrite").partitionBy("shard") \
        .parquet(p_out["manifest"])

    (all_blocks.groupBy("field", "term")
     .agg(F.sum("count").alias("df"), F.max("max_tf_norm").alias("max_tf_norm"))
     .withColumn("seg", F.lit(0))
     .write.mode("overwrite").partitionBy("seg").parquet(p_out["dictionary"]))

    cache_handle and cache_handle.unpersist()

    new_meta = IndexMeta(
        n_docs=n_docs, avgdl=avgdl, num_shards=n_shards,
        docs_per_shard=docs_per_shard, block_size=blk,
        hash_version=meta.hash_version, k1=meta.k1, b=meta.b,
        format_version=meta.format_version, total_doclen=total_doclen,
        # epoch ledger survives: a checkpointed ingest resumed after
        # compaction must still skip already-applied epochs
        applied_epochs=meta.applied_epochs,
    )
    write_meta(out, new_meta)  # the new index's commit point

    metrics = {
        "compacted_docs": n_docs,
        "dropped_docs": int(docstats.count()) - n_docs,
        "num_shards": n_shards,
        "avgdl": avgdl,
        "wall_sec": round(time.time() - t0, 3),
        "out_dir": out,
    }

    if in_place:
        # whole-directory swap, never artifact-by-artifact: the previous
        # scheme deleted old artifact dirs and moved new ones BEFORE writing
        # the new meta.json, so a crash in that window left the OLD meta
        # (old n_docs/docs_per_shard/avgdl) over renumbered artifacts —
        # silently wrong query results (round-3 advice). With the dir swap a
        # crash leaves, at every instant, two internally-consistent indexes
        # on disk: before the first rename the old index serves unchanged;
        # between the renames index_dir is briefly ABSENT (a loud, detectable
        # state — recover by renaming either .old or .compact back); after
        # the second rename the new index is fully live. The new index's own
        # meta.json was already committed above, so whichever directory wins
        # is complete.
        old = index_dir.rstrip("/") + ".old"
        shutil.rmtree(old, ignore_errors=True)
        shutil.move(index_dir, old)
        shutil.move(out, index_dir)
        shutil.rmtree(old, ignore_errors=True)
        metrics["out_dir"] = index_dir

    import json

    with open(_paths(metrics["out_dir"])["metrics"], "w") as f:
        json.dump(metrics, f)
    return metrics
