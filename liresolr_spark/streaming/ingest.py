"""Incremental index refresh: Structured Streaming ingest + segment append.

The reference's nearest analog is Solr near-real-time indexing —
`commitWithin=1000` on the REST update sink (ref: scripts/add_histograms.py:40)
— backed by Lucene's segment model: new docs land in NEW segments, queries
see the union, and per-segment statistics merge at read time. We reproduce
exactly that shape on Spark:

- `append_segment(batch_df, index_dir)` turns one micro-batch of corpus rows
  into fresh shards appended after the existing ones: docIDs continue from
  `meta.n_docs`, blocks/docstats land in new `shard=` partitions, a
  dictionary FRAGMENT (df per term for this segment alone) is appended, and
  meta.json is rewritten last (n_docs, total_doclen -> avgdl, num_shards) as
  the commit point. Query paths already merge fragments (df summed per term)
  and use the avgdl-independent per-block (max_tf, min_dl) WAND bound, so
  appended indexes stay rank-identical to a from-scratch oracle with the
  updated global statistics.

- `incremental_index(spark, input_dir, index_dir, checkpoint_dir)` wires the
  same append through Structured Streaming's file source: `readStream` over
  a directory of corpus parquet files, `foreachBatch(append_segment)`,
  `trigger(availableNow)`, checkpointed so restarts resume from the last
  committed file offset. Batch retries are made idempotent by an epoch
  ledger committed atomically inside meta.json, plus pre-cleanup of ALL of
  the segment's partition dirs (docstats/blocks shard=, manifest shard=,
  dictionary seg=) before re-writing.

Live query engines cache index handles; after a committed append, call
`LireQueryEngine.refresh()` (the Solr searcher-reopen analog) to pick up
the new segments and updated global statistics.

Cross-segment OVERWRITE semantics (ref: scripts/add_histograms.py:40
`overwrite=true` — Solr's unique-key replace): when an appended batch
carries a UNIQUE_KEY (repo, path) already present in earlier segments, the
older docIDs are recorded as TOMBSTONES (`tombstones/seg=<segment>` rows,
committed under the same idempotent retry discipline as the dictionary
fragments). Query paths exclude tombstoned docs from RESULTS via the WAND
kernels' deny-list and a docstats anti-join; index-level statistics
(df/N/avgdl) keep counting superseded docs until compaction — exactly
Lucene's deleted-docs behavior, where docFreq includes deletes until a
segment merge. `plans.compact.compact_index` (the Lucene merge analog)
physically drops tombstoned docs, renumbers, and restores exact statistics.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from liresolr_spark import BM25_B, BM25_K1
from liresolr_spark.plans.build import (
    NATURAL_KEY,
    _block_builder,
    _paths,
    build_index,
    read_meta,
    write_meta,
)
from liresolr_spark.plans.build import BLOCK_SCHEMA
from liresolr_spark.functions.tokenizer import tokenize_expr
from liresolr_spark.sources.corpus import assign_doc_ids

# Solr-style unique key for overwrite semantics: re-adding the same
# (repo, path) — a new commit/content of the same file — supersedes the old
# version (last-write-wins, like the reference's overwrite=true). Applied
# BOTH across segments (tombstones) and within a micro-batch (deterministic
# winner per key before indexing — see append_segment).
UNIQUE_KEY = ["repo", "path"]


def _applied_epochs(index_dir: str) -> set[int]:
    """Applied-epoch ledger lives INSIDE meta.json: the ledger and the index
    statistics commit in one atomic rename, so a crash can never record one
    without the other (which would double- or re-append on retry)."""
    p = _paths(index_dir)["meta"]
    if os.path.exists(p):
        return set(read_meta(index_dir).applied_epochs or [])
    return set()


def append_segment(
    batch: DataFrame,
    index_dir: str,
    epoch_id: int | None = None,
    num_shards: int | None = None,
    block_size: int | None = None,
    with_positions: bool = False,
) -> dict:
    """Append one batch of corpus rows as new shards of an existing index.

    First call (no meta.json yet) delegates to `build_index`. Returns the
    per-append metrics dict. Idempotent per epoch_id: a retried micro-batch
    (foreachBatch at-least-once contract) is skipped if its epoch committed,
    and a half-written attempt's shard dirs are cleaned before re-writing.

    with_positions applies to the FIRST build only; appended segments
    always follow the existing meta flag so every segment agrees (a mixed
    index would silently lose phrase coverage on some segments).
    """
    # WITHIN-batch overwrite: two versions of the same UNIQUE_KEY (repo,
    # path) arriving in one micro-batch resolve to a single winner BEFORE
    # indexing — Solr overwrite=true is last-write-wins, and without this
    # both versions stayed live indefinitely (the cross-segment tombstones
    # below only supersede EARLIER segments; round-3 advice). The reference's
    # arrival order is racy (parallel indexer), so the winner is made
    # deterministic: highest commit, ties broken by content hash. One
    # shuffle keyed by UNIQUE_KEY, bounded by the batch size.
    from pyspark.sql.window import Window

    w = Window.partitionBy(*UNIQUE_KEY).orderBy(
        F.desc("commit"), F.desc(F.md5("content")))
    batch = (batch.withColumn("_ver", F.row_number().over(w))
             .filter(F.col("_ver") == 1).drop("_ver"))

    p = _paths(index_dir)
    if not os.path.exists(p["meta"]):
        # first build: the epoch ledger rides INSIDE build_index's single
        # meta commit — stats and ledger land in one atomic rename, so a
        # crash can't leave meta committed but the epoch unrecorded (the
        # retry would then re-append this same batch)
        return build_index(
            batch, index_dir,
            num_shards=num_shards or 8,
            block_size=block_size or 128,
            with_positions=with_positions,
            applied_epochs=[epoch_id] if epoch_id is not None else None)

    if epoch_id is not None and epoch_id in _applied_epochs(index_dir):
        return {"skipped_epoch": epoch_id}

    spark = batch.sparkSession
    meta = read_meta(index_dir)
    from liresolr_spark import INDEX_FORMAT_VERSION

    if meta.format_version != INDEX_FORMAT_VERSION:
        raise RuntimeError(
            f"index format v{meta.format_version} != current "
            f"v{INDEX_FORMAT_VERSION}: an append would mix block layouts "
            "in one parquet dir — run plans.compact.compact_index (full "
            "rewrite) to upgrade first")
    # allocator, not count: after a partial compaction n_docs < max docID+1
    base_docid = meta.next_docid if meta.next_docid is not None else meta.n_docs
    base_shard = meta.num_shards

    # cache=True: the per-partition count job and the docID-materializing
    # jobs must share ONE materialization of the repartitionByRange output —
    # re-executing the lineage could re-sample range bounds and mis-align
    # the cumulative offsets (duplicate/skipped docIDs). Same hardening as
    # the batch build path.
    docs = assign_doc_ids(batch, NATURAL_KEY, dedup=True, cache=True)
    ranged_part = docs._lsr_cached_part
    docs = (
        docs.withColumn("docID", F.col("docID") + F.lit(base_docid))
        .withColumn("tokens", tokenize_expr(F.col("content")))
        .withColumn("doclen", F.size("tokens"))
        .withColumn(
            "shard",
            (F.lit(base_shard)
             + ((F.col("docID") - base_docid) / F.lit(meta.docs_per_shard))
             .cast("int")),
        )
    )
    row = docs.agg(F.count("*").alias("n"),
                   F.sum("doclen").alias("s")).first()
    n_new, dl_new = int(row["n"]), float(row["s"] or 0.0)
    if n_new == 0:
        if ranged_part is not None:
            ranged_part.unpersist()
        return {"appended_docs": 0}

    new_total = meta.total_doclen + dl_new
    new_n = meta.n_docs + n_new
    new_avgdl = new_total / new_n
    new_shard_hi = base_shard + (n_new - 1) // meta.docs_per_shard + 1

    # clean any half-written attempt of this segment (crash between data
    # write and the meta commit), then write. EVERY pre-commit artifact of
    # the segment lives under a shard>=base_shard or seg=base_shard
    # partition dir, so this cleanup makes the whole append idempotent —
    # including the dictionary fragment and manifest rows, which are
    # mode('append') writes (round-1 advice: a crash between the fragment
    # append and the meta commit must not double df on retry).
    for key, prefix in (("docstats", "shard="), ("blocks", "shard="),
                        ("manifest", "shard="), ("dictionary", "seg="),
                        ("tombstones", "seg=")):
        base = p[key]
        if os.path.exists(base):
            for d in os.listdir(base):
                if d.startswith(prefix) and int(d.split("=", 1)[1]) >= base_shard:
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    docstats = docs.select(
        "docID", "shard", "repo", "path", "commit", "lang", "doclen",
        F.sha2(F.col("content"), 256).alias("sha256"),
    )
    docstats.write.mode("append").partitionBy("shard").parquet(p["docstats"])

    # cross-segment overwrite (Solr overwrite=true, ref:
    # scripts/add_histograms.py:40): docIDs in EARLIER segments whose
    # UNIQUE_KEY reappears in this batch are superseded — last write wins.
    # Recorded as tombstones under this segment's seg= dir (same idempotent
    # retry unit as the dictionary fragment); the shuffle is bounded by the
    # batch's key count (leftsemi against a batch-sized key set), never a
    # corpus-wide dedup. Query paths deny-list these docIDs; compaction
    # physically removes them.
    existing = spark.read.parquet(p["docstats"]).filter(
        F.col("shard") < base_shard).select("docID", "shard", *UNIQUE_KEY)
    new_keys = docs.select(*UNIQUE_KEY).distinct()
    (existing.join(new_keys, UNIQUE_KEY, "leftsemi")
     .select("docID", F.col("shard").cast("int").alias("shard"))
     .withColumn("seg", F.lit(base_shard))
     .write.mode("append").partitionBy("seg").parquet(p["tombstones"]))
    from liresolr_spark.plans.build import load_tombstones

    n_tombs = load_tombstones(spark, index_dir).filter(
        F.col("seg") == base_shard).count()

    from liresolr_spark.plans.build import (
        exploded_terms, positional_postings_input, tf_aggregate)

    exploded = exploded_terms(docs, with_hash_tokens=True,
                              with_positions=meta.with_positions)
    # positional: lexical occurrence rows straight to the kernel, ha
    # pre-aggregated (see plans.build.positional_postings_input)
    tf = (positional_postings_input(exploded) if meta.with_positions
          else tf_aggregate(exploded))
    builder = _block_builder(meta.block_size, BM25_K1, BM25_B, new_avgdl)
    # same adaptive within-shard term-hash salt as the batch build: bounds
    # one Arrow group's postings regardless of segment size (see
    # build_index group_salts / TARGET_GROUP_ROWS)
    from liresolr_spark.plans.build import TARGET_GROUP_ROWS

    n_seg_shards = max(new_shard_hi - base_shard, 1)
    group_salts = max(1, int(-(-(dl_new / n_seg_shards) // TARGET_GROUP_ROWS)))
    if group_salts > 1:
        salted = tf.withColumn(
            "gsalt", F.pmod(F.xxhash64("term"), F.lit(group_salts)).cast("int"))
        blocks = salted.groupBy("shard", "field", "gsalt").applyInArrow(
            builder, schema=BLOCK_SCHEMA)
    else:
        blocks = tf.groupBy("shard", "field").applyInArrow(
            builder, schema=BLOCK_SCHEMA)
    (blocks.sortWithinPartitions("field", "term", "block_seq")
     .write.partitionBy("shard").mode("append").parquet(p["blocks"]))

    seg_blocks = spark.read.parquet(p["blocks"]).filter(
        F.col("shard") >= base_shard)
    manifest = (
        seg_blocks.groupBy("shard").agg(
            F.min("term").alias("term_lo"),
            F.max("term").alias("term_hi"),
            F.sum(F.length("docids") + F.length("tfs")
                  + F.length("doclens")).alias("bytes_written"))
        .join(
            spark.read.parquet(p["docstats"])
            .filter(F.col("shard") >= base_shard)
            .groupBy("shard").agg(F.count("*").alias("docs_indexed")),
            "shard", "full")
        .withColumn("status", F.lit("done"))
    )
    manifest.write.mode("append").partitionBy("shard").parquet(p["manifest"])

    # segment dictionary fragment: df per term for THIS segment only, under
    # its own seg=<base_shard> partition dir (idempotent retry unit);
    # queries merge fragments by summing df per (field, term)
    (seg_blocks.groupBy("field", "term")
     .agg(F.sum("count").alias("df"), F.max("max_tf_norm").alias("max_tf_norm"))
     .withColumn("seg", F.lit(base_shard))
     .write.mode("append").partitionBy("seg").parquet(p["dictionary"]))

    if ranged_part is not None:
        ranged_part.unpersist()

    # commit point: meta + epoch ledger in ONE atomic rename, written last
    meta.n_docs = new_n
    meta.avgdl = new_avgdl
    meta.total_doclen = new_total
    meta.num_shards = new_shard_hi
    meta.next_docid = base_docid + n_new
    if epoch_id is not None:
        applied = set(meta.applied_epochs or [])
        applied.add(epoch_id)
        meta.applied_epochs = sorted(applied)
    write_meta(index_dir, meta)
    return {"appended_docs": n_new, "new_shards": new_shard_hi - base_shard,
            "n_docs": new_n, "avgdl": new_avgdl, "tombstoned_docs": n_tombs}


def maintain_index(
    spark: SparkSession,
    index_dir: str,
    max_appended_segments: int = 8,
    max_segment_docs: int | None = None,
    tier_factor: int = 8,
) -> dict | None:
    """Background-merge policy trigger (the TieredMergePolicy maintenance
    loop Lucene runs behind commitWithin, ref: scripts/add_histograms.py:40):
    when the number of APPENDED segments reaches `max_appended_segments`,
    merge the small ones via `plans.compact.compact_segments` (O(merged),
    base segment untouched). Below the threshold: no-op, returns None.

    Why a count policy: every appended segment adds dictionary/tombstone
    fragments that each query's planning must union — unbounded appends
    degrade read amplification linearly. Bounding the segment count keeps
    the serving engine's per-query planning cost flat while never paying
    the O(index) full rewrite (`compact_index`) on the hot path.

    Why a size tier and not merge-everything: the output of a previous
    merge is itself an appended segment; remerging it on every trigger
    would rewrite the whole appended history each time — O(N²) total
    write cost over a long-running ingest. `max_segment_docs` gates
    merging to segments at most that large; the default (None) derives
    the gate adaptively as `tier_factor × median(live docs per appended
    segment)`: fresh micro-batch segments dominate the median, so an
    accumulated merged segment retires from merging once it outgrows its
    tier, and same-tier merged segments still coalesce into the next tier
    when enough accumulate — Lucene's logarithmic merge ladder."""
    from liresolr_spark.plans.compact import _segments, compact_segments

    appended = [s for s in _segments(spark, index_dir) if s[0] != 0]
    if len(appended) < max_appended_segments:
        return None
    if max_segment_docs is None:
        # LIVE docs per appended segment (tombstoned docs excluded — the
        # merge itself drops them, so counting them would keep a mostly-
        # superseded merged segment above its tier forever): one
        # O(#shards)-row agg
        from liresolr_spark.plans.build import load_tombstones

        stats = spark.read.parquet(f"{index_dir}/docstats")
        tombs = load_tombstones(spark, index_dir)
        if tombs is not None:
            stats = stats.join(tombs.select("docID").distinct(), "docID",
                               "left_anti")
        per_shard = {
            int(r["shard"]): int(r["n"])
            for r in stats.groupBy("shard").agg(
                F.count("*").alias("n")).collect()}
        sizes = sorted(
            sum(per_shard.get(sh, 0) for sh in range(lo, hi))
            for _, lo, hi in appended)
        median = sizes[len(sizes) // 2]
        max_segment_docs = max(1, tier_factor * median)
    return compact_segments(spark, index_dir,
                            max_segment_docs=max_segment_docs)


def incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    num_shards: int = 8,
    block_size: int = 128,
    maintain_after_segments: int | None = None,
    maintain_max_segment_docs: int | None = None,
    with_positions: bool = False,
):
    """Stream corpus parquet files into the index (file source -> foreachBatch
    segment append). With available_now=True the query drains all unread
    files and terminates — the batch-refresh cadence of the reference's
    commitWithin; pass False for a continuous micro-batch ingest.

    maintain_after_segments: if set, run `maintain_index` after each
    committed append — appended segments are merged whenever their count
    reaches the threshold (Lucene's background merge during indexing), so
    a long-running ingest keeps bounded read amplification without any
    external maintenance job. Safe on retry: the merge is itself
    crash-recoverable (compact_segments two-phase commit) and idempotence
    of the append is unaffected (the epoch ledger gates re-appends, not
    segment layout)."""
    from liresolr_spark.sources.corpus import CORPUS_SCHEMA

    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        append_segment(batch_df, index_dir, epoch_id=epoch_id,
                       num_shards=num_shards, block_size=block_size,
                       with_positions=with_positions)
        if maintain_after_segments is not None:
            maintain_index(spark, index_dir,
                           max_appended_segments=maintain_after_segments,
                           max_segment_docs=maintain_max_segment_docs)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
