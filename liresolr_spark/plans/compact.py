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

from liresolr_spark import BM25_B, BM25_K1, INDEX_FORMAT_VERSION
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


def _decoded_postings(blocks_df, with_positions: bool = False):
    """blocks -> (field, term, docID, tf, doclen[, positions]) rows,
    vectorized decode.

    One Arrow batch of block rows expands to its postings with numpy
    concatenation + np.repeat for the term column — no per-posting Python.

    with_positions=True carries each posting's positions as its PRE-ENCODED
    byte slice (codec.positions_byte_slices): positions are delta-gapped
    within the posting, so the slice is docID-independent and the rebuild
    kernel re-concatenates slices into valid blocks with zero recoding —
    a docID remap never touches position bytes."""
    import pandas as pd

    from liresolr_spark.functions.codec import decode_block, positions_byte_slices

    def explode(batches):
        for pdf in batches:
            ids_l, tfs_l, dls_l, terms_l, fields_l, pos_l = \
                [], [], [], [], [], []
            for i, (field, term, d, t, ln) in enumerate(zip(
                pdf["field"], pdf["term"], pdf["docids"], pdf["tfs"],
                pdf["doclens"],
            )):
                ids, tfs, dls = decode_block(bytes(d), bytes(t), bytes(ln))
                n = len(ids)
                ids_l.append(ids.astype(np.int64))
                tfs_l.append(tfs.astype(np.int64))
                dls_l.append(dls.astype(np.int64))
                terms_l.append(np.repeat(term, n))
                fields_l.append(np.repeat(field, n))
                if with_positions:
                    pb = bytes(pdf["positions"].iloc[i])
                    pos_l.append(
                        positions_byte_slices(pb, tfs) if pb
                        else [b""] * n)
            cols = {
                "field": pd.Series(dtype="object"),
                "term": pd.Series(dtype="object"),
                "docID": pd.Series(dtype="int64"),
                "tf": pd.Series(dtype="int64"),
                "doclen": pd.Series(dtype="int64")}
            if with_positions:
                cols["positions"] = pd.Series(dtype="object")
            if not ids_l:
                yield pd.DataFrame(cols)
                continue
            out = {
                "field": np.concatenate(fields_l),
                "term": np.concatenate(terms_l),
                "docID": np.concatenate(ids_l),
                "tf": np.concatenate(tfs_l),
                "doclen": np.concatenate(dls_l),
            }
            if with_positions:
                out["positions"] = np.asarray(
                    [b for blk in pos_l for b in blk], dtype=object)
            yield pd.DataFrame(out)

    schema = ("field string, term string, docID long, tf long, doclen long"
              + (", positions binary" if with_positions else ""))
    cols = ["field", "term", "docids", "tfs", "doclens"] \
        + (["positions"] if with_positions else [])
    return blocks_df.select(*cols).mapInPandas(explode, schema=schema)


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
    # (positions ride as pre-encoded per-posting byte slices — see
    # _decoded_postings — so the remap never recodes them)
    pos_cols = ["positions"] if meta.with_positions else []
    postings = _decoded_postings(spark.read.parquet(p_in["blocks"]),
                                 with_positions=meta.with_positions)
    id_map = mapped.select(
        F.col("old_docID").alias("docID"),
        F.col("docID").alias("new_docID"), "shard")
    remapped = (
        postings.join(id_map, "docID")  # inner join drops tombstoned postings
        .select("shard", "field", "term",
                F.col("new_docID").alias("docID"), "tf", "doclen", *pos_cols)
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
        # a full rewrite re-encodes every block in the CURRENT layout, so
        # it stamps the current version — the upgrade path for old indexes
        # (appends and partial merges refuse cross-version work instead,
        # since they would mix block layouts inside one parquet dir)
        format_version=INDEX_FORMAT_VERSION, total_doclen=total_doclen,
        next_docid=n_docs,  # full compaction renumbers densely
        # epoch ledger survives: a checkpointed ingest resumed after
        # compaction must still skip already-applied epochs
        applied_epochs=meta.applied_epochs,
        with_positions=meta.with_positions,
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


# ---------------------------------------------------------------------------
# Tiered / partial compaction (round-3 verdict #6)
# ---------------------------------------------------------------------------

def _segments(spark: SparkSession, index_dir: str) -> list[tuple[int, int, int]]:
    """[(seg_id, shard_lo, shard_hi)] — a segment is one append unit: the
    base build is seg 0 covering shards [0, first_append); each append's
    seg id is the shard it started at (the layout append_segment writes:
    dictionary seg=<base_shard> fragments)."""
    p = _paths(index_dir)
    segs = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(p["dictionary"]) if d.startswith("seg="))
    hi = read_meta(index_dir).num_shards
    bounds = segs + [hi]
    return [(segs[i], bounds[i], bounds[i + 1]) for i in range(len(segs))]


def compact_segments(
    spark: SparkSession,
    index_dir: str,
    max_segment_docs: int | None = None,
    min_segments: int = 2,
) -> dict:
    """TIERED partial compaction: merge only SMALL appended segments into
    one fresh segment, leaving the (large) base segment untouched — the
    TieredMergePolicy shape behind the reference's commitWithin appends
    (ref: scripts/add_histograms.py:40; Lucene merges candidate segments by
    size, never the whole index). `compact_index` rewrites everything and
    costs O(index); this costs O(merged segments) — the right cadence at
    100 TB is frequent small-segment merges with a rare full rewrite.

    Semantics:
    - candidate segments: appended segments (seg != 0) holding
      <= max_segment_docs docs (None = every appended segment). Fewer than
      `min_segments` candidates and no tombstones to apply -> no-op.
    - surviving docs KEEP their docIDs (no global renumber — that is what
      makes the base untouchable); they are re-sharded into fresh shard ids
      allocated above meta.num_shards, so readers' dir listing stays
      collision-free and the next append's base_shard stays valid.
    - tombstones whose target lies INSIDE the merged segments are applied
      physically (docs + postings dropped, exactly a Lucene merge);
      tombstones recorded BY merged segments but targeting the base/kept
      segments are rewritten under the new segment's seg dir (they must
      outlive the merge). Dangling tombstones in kept segments that target
      now-dropped docIDs are harmless (the deny-list just never matches).
    - statistics become exact for the dropped docs: n_docs/total_doclen
      shrink, avgdl is recomputed, the merged segments' dictionary
      fragments are replaced by one fragment over live postings — df no
      longer counts the physically removed docs (base-fragment df never
      counted them: appends only tombstone EARLIER segments' docs, so a
      doc's own fragment is always older than its tombstone).
    - meta.next_docid is the append allocator and is NOT reduced.

    Crash safety (two-phase commit, the segments_N analog): a marker file
    (compact_segments.json) carrying the full recovery payload is written
    FIRST; read_meta refuses to open the index while it exists, and
    `repair_segment_compaction` rolls an interrupted run back (new dirs
    removed) or forward (old dirs removed, meta committed) depending on how
    far it got. The marker is deleted last.
    """
    import json
    import time

    t0 = time.time()
    meta = read_meta(index_dir)
    if meta.format_version != INDEX_FORMAT_VERSION:
        raise RuntimeError(
            f"index format v{meta.format_version} != current "
            f"v{INDEX_FORMAT_VERSION}: a partial merge would mix block "
            "layouts in one parquet dir — run compact_index (full rewrite) "
            "to upgrade first")
    p = _paths(index_dir)
    segs = _segments(spark, index_dir)
    appended = [s for s in segs if s[0] != segs[0][0]]

    docstats = spark.read.parquet(p["docstats"])
    if max_segment_docs is None:
        merge = list(appended)  # ungated: skip the per-segment size job
    else:
        # live docs per appended segment, aggregated from per-shard counts
        per_seg: dict[int, int] = {}
        for r in docstats.groupBy("shard").agg(
                F.count("*").alias("n")).collect():
            for seg_lo, lo, hi in appended:
                if lo <= int(r["shard"]) < hi:
                    per_seg[seg_lo] = per_seg.get(seg_lo, 0) + int(r["n"])
        merge = [s for s in appended
                 if per_seg.get(s[0], 0) <= max_segment_docs]
    merge_shards = [sh for _, lo, hi in merge for sh in range(lo, hi)]
    merge_seg_ids = [s[0] for s in merge]

    tombs = load_tombstones(spark, index_dir)
    if len(merge) < min_segments:
        # too few candidates: merge anyway only if tombstones inside them
        # need physical application (the count job runs ONLY on this path)
        n_drop_inside = 0
        if tombs is not None:
            n_drop_inside = (tombs.filter(F.col("shard").isin(merge_shards))
                             .select("docID").distinct().count())
        if n_drop_inside == 0:
            return {"merged_segments": 0, "reason": "nothing to merge"}

    mstats = docstats.filter(F.col("shard").isin(merge_shards))
    drop = (tombs.filter(F.col("shard").isin(merge_shards))
            .select("docID").distinct() if tombs is not None else None)
    live = mstats if drop is None else mstats.join(drop, "docID", "left_anti")

    # fresh shard ids above every existing one; survivors keep their docIDs
    new_base = meta.num_shards
    from liresolr_spark.sources.corpus import assign_doc_ids

    ranked = assign_doc_ids(
        live.withColumnRenamed("docID", "old_docID")
        .withColumnRenamed("shard", "old_shard"),
        keys=["old_docID"], cache=True)
    cache_handle = ranked._lsr_cached_part
    agg = ranked.agg(F.count("*").alias("n"), F.sum("doclen").alias("s"),
                     F.max("docID").alias("mx")).first()
    n_live, live_doclen = int(agg["n"]), float(agg["s"] or 0.0)
    # ONE pass over the merged segments' stats for count + doclen (each
    # extra action here is a whole fixed-cost Spark job — at the frequent-
    # small-merge cadence this function exists for, job count IS the cost)
    magg = mstats.agg(F.count("*").alias("n"),
                      F.sum("doclen").alias("s")).first()
    n_merged_total = int(magg["n"])
    merged_doclen = float(magg["s"] or 0.0)
    n_dropped = n_merged_total - n_live
    new_shards = ((int(agg["mx"]) // meta.docs_per_shard + 1)
                  if n_live else 0)
    new_total_doclen = meta.total_doclen - (merged_doclen - live_doclen)

    new_meta = IndexMeta(
        n_docs=meta.n_docs - n_dropped,
        avgdl=new_total_doclen / max(meta.n_docs - n_dropped, 1),
        num_shards=new_base + new_shards,
        docs_per_shard=meta.docs_per_shard, block_size=meta.block_size,
        hash_version=meta.hash_version, k1=meta.k1, b=meta.b,
        format_version=meta.format_version,
        total_doclen=new_total_doclen,
        next_docid=(meta.next_docid if meta.next_docid is not None
                    else meta.n_docs),
        applied_epochs=meta.applied_epochs,
        with_positions=meta.with_positions,
    )

    # ---- phase 1: marker with the full recovery payload -------------------
    # old_dirs_present records which old artifact dirs EXIST at start: an
    # old dir that legitimately never existed (e.g. a merged shard whose
    # docs are all empty-content writes no blocks/shard=K) must not make a
    # pre-delete crash look like "delete phase begun" to repair. pid lets
    # repair refuse to touch a merge that is still running.
    old_rel = (
        [f"docstats/shard={s}" for s in merge_shards]
        + [f"blocks/shard={s}" for s in merge_shards]
        + [f"dictionary/seg={s}" for s in merge_seg_ids])
    marker = {
        "new_seg": new_base,
        "new_shards": list(range(new_base, new_base + new_shards)),
        "merged_shards": merge_shards,
        "merged_seg_ids": merge_seg_ids,
        "new_meta": {k: v for k, v in new_meta.__dict__.items()},
        "old_dirs_present": [
            d for d in old_rel
            if os.path.exists(os.path.join(index_dir, d))],
        "pid": os.getpid(),
    }
    tmp = p["segmarker"] + ".tmp"
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, p["segmarker"])

    # ---- phase 2: write the merged segment under NEW shard/seg ids --------
    new_map = ranked.select(
        F.col("old_docID").alias("docID"),
        (F.lit(new_base) + (F.col("docID") / F.lit(meta.docs_per_shard))
         .cast("int")).alias("shard"),
        "repo", "path", "commit", "lang", "doclen", "sha256")
    new_map.write.mode("append").partitionBy("shard").parquet(p["docstats"])

    shard_of = new_map.select("docID", "shard")
    merged_blocks = spark.read.parquet(p["blocks"]).filter(
        F.col("shard").isin(merge_shards))
    pos_cols = ["positions"] if meta.with_positions else []
    postings = _decoded_postings(merged_blocks,
                                 with_positions=meta.with_positions)
    remapped = postings.join(shard_of, "docID").select(
        "shard", "field", "term", "docID", "tf", "doclen", *pos_cols)

    group_salts = max(1, int(-(-(live_doclen / max(new_shards, 1))
                               // TARGET_GROUP_ROWS)))
    builder = _block_builder(meta.block_size, BM25_K1, BM25_B, new_meta.avgdl)
    if group_salts > 1:
        salted = remapped.withColumn(
            "gsalt", F.pmod(F.xxhash64("term"), F.lit(group_salts)).cast("int"))
        blocks = salted.groupBy("shard", "field", "gsalt").applyInArrow(
            builder, schema=BLOCK_SCHEMA)
    else:
        blocks = remapped.groupBy("shard", "field").applyInArrow(
            builder, schema=BLOCK_SCHEMA)
    (blocks.sortWithinPartitions("field", "term", "block_seq")
     .write.partitionBy("shard").mode("append").parquet(p["blocks"]))

    # the fresh segment's blocks feed BOTH the manifest and the dictionary
    # fragment: persist across the two scans (tiny — just-written segment)
    seg_blocks = spark.read.parquet(p["blocks"]).filter(
        F.col("shard") >= new_base).persist()
    (seg_blocks.groupBy("shard").agg(
        F.min("term").alias("term_lo"), F.max("term").alias("term_hi"),
        F.sum(F.length("docids") + F.length("tfs")
              + F.length("doclens")).alias("bytes_written"))
     .join(new_map.groupBy("shard").agg(F.count("*").alias("docs_indexed")),
           "shard", "full")
     .withColumn("status", F.lit("done"))
     .write.mode("append").partitionBy("shard").parquet(p["manifest"]))
    (seg_blocks.groupBy("field", "term")
     .agg(F.sum("count").alias("df"), F.max("max_tf_norm").alias("max_tf_norm"))
     .withColumn("seg", F.lit(new_base))
     .write.mode("append").partitionBy("seg").parquet(p["dictionary"]))
    seg_blocks.unpersist()

    # tombstones recorded by merged segments but targeting docs we did NOT
    # rebuild (base / kept segments) must survive under the new seg dir
    if tombs is not None:
        surviving = tombs.filter(
            F.col("seg").isin(merge_seg_ids)
            & ~F.col("shard").isin(merge_shards))
        (surviving.select("docID", "shard").withColumn("seg", F.lit(new_base))
         .write.mode("append").partitionBy("seg").parquet(p["tombstones"]))

    if cache_handle is not None:
        cache_handle.unpersist()

    # ---- phase 3: drop the old merged artifacts ----------------------------
    for key, prefix, ids in (
        ("docstats", "shard=", merge_shards), ("blocks", "shard=", merge_shards),
        ("manifest", "shard=", merge_shards),
        ("dictionary", "seg=", merge_seg_ids),
        ("tombstones", "seg=", merge_seg_ids),
    ):
        base_dir = p[key]
        if os.path.exists(base_dir):
            for d in os.listdir(base_dir):
                if d.startswith(prefix) and int(d.split("=", 1)[1]) in ids:
                    shutil.rmtree(os.path.join(base_dir, d), ignore_errors=True)

    # ---- phase 4+5: commit meta, clear the marker --------------------------
    write_meta(index_dir, new_meta)
    os.remove(p["segmarker"])

    return {
        "merged_segments": len(merge), "merged_docs": n_merged_total,
        "dropped_docs": n_dropped, "new_seg": new_base,
        "new_shards": new_shards, "n_docs": new_meta.n_docs,
        "wall_sec": round(time.time() - t0, 3),
    }


def repair_segment_compaction(index_dir: str, force: bool = False) -> str:
    """Resolve a crashed compact_segments run (marker present).

    If every old merged artifact recorded as present at merge start still
    exists, the merge had not reached its delete phase: ROLL BACK by
    removing the new segment's dirs. If any is already gone, the merge was
    past the point of no return: ROLL FORWARD by removing the remaining
    old dirs and committing the meta payload stored in the marker. Either
    way the marker is cleared and the index is consistent. Returns
    'rolled_back' or 'rolled_forward'.

    Refuses (RuntimeError) while the process that wrote the marker is
    still alive on this host — a marker under a LIVE compact_segments is
    an in-progress merge, not a crash, and repairing underneath it would
    corrupt the index. `force=True` overrides (e.g. the pid was recycled
    by an unrelated process after a host reboot)."""
    import json

    p = _paths(index_dir)
    with open(p["segmarker"]) as f:
        marker = json.load(f)

    pid = marker.get("pid")
    from liresolr_spark.plans.build import _pid_alive

    if (not force and pid is not None and pid != os.getpid()
            and _pid_alive(pid)):
        raise RuntimeError(
            f"compact_segments (pid {pid}) appears to still be running on "
            f"this host; the marker marks an IN-PROGRESS merge, not a "
            "crash. Wait for it, or pass force=True if the pid is stale")

    def _dirs(key, prefix, ids):
        return [os.path.join(p[key], f"{prefix}{i}") for i in ids]

    # markers from before old_dirs_present fall back to the full expected
    # list (the old, stricter behavior)
    if "old_dirs_present" in marker:
        old_dirs = [os.path.join(index_dir, d)
                    for d in marker["old_dirs_present"]]
    else:
        old_dirs = (
            _dirs("docstats", "shard=", marker["merged_shards"])
            + _dirs("blocks", "shard=", marker["merged_shards"])
            + _dirs("dictionary", "seg=", marker["merged_seg_ids"]))
    new_dirs = (
        _dirs("docstats", "shard=", marker["new_shards"])
        + _dirs("blocks", "shard=", marker["new_shards"])
        + _dirs("manifest", "shard=", marker["new_shards"])
        + _dirs("dictionary", "seg=", [marker["new_seg"]])
        + _dirs("tombstones", "seg=", [marker["new_seg"]]))

    if all(os.path.exists(d) for d in old_dirs):
        for d in new_dirs:
            shutil.rmtree(d, ignore_errors=True)
        os.remove(p["segmarker"])
        return "rolled_back"
    # past the delete phase: finish it
    for d in old_dirs + _dirs("manifest", "shard=", marker["merged_shards"]) \
            + _dirs("tombstones", "seg=", marker["merged_seg_ids"]):
        shutil.rmtree(d, ignore_errors=True)
    write_meta(index_dir, IndexMeta(**marker["new_meta"]))
    os.remove(p["segmarker"])
    return "rolled_forward"
