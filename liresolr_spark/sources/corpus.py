"""Corpus source: the engine's input table + deterministic docID assignment.

Input shape (mandated): (repo string, path string, commit string,
lang string, content string). The reference's analog is the flat Solr
document with `id` as primary key (ref: README.md:140,
ParallelSolrIndexer.java:444-446); our natural key is (repo, path, commit)
and `docID` is its dense global rank.

`synthetic_code_corpus` generates the FIXTURES.md §1 table: deterministic,
seed-derived, distributed (each row is a pure function of its row index —
generated inside mapInPandas so no driver-side materialization), with
deliberately skewed hot keywords (`import`, `return`, `def`, `public`)
so hot-term handling is exercised.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

_LANGS = ["python", "java", "scala", "go", "js"]
_LANG_W = np.array([0.35, 0.25, 0.15, 0.15, 0.10])
_EXT = {"python": "py", "java": "java", "scala": "scala", "go": "go", "js": "js"}
_HOT = ["import", "return", "def", "public"]  # Zipf-hot keywords

# ~2000-stem seeded vocabulary: camelCase and snake_case identifiers built
# from stem pairs so camel-splitting is exercised.
_STEMS = None


def _vocab(seed: int = 42):
    global _STEMS
    if _STEMS is None:
        rng = np.random.default_rng(seed)
        syll = ["foo", "bar", "baz", "qux", "data", "node", "list", "tree", "hash",
                "map", "key", "val", "index", "query", "parse", "read", "write",
                "open", "close", "send", "recv", "pack", "sort", "merge", "scan",
                "join", "find", "emit", "token", "block", "chunk", "file", "path",
                "user", "time", "count", "batch", "row", "col", "str", "buf"]
        stems = set()
        while len(stems) < 2000:
            a, b = rng.choice(syll), rng.choice(syll)
            n = rng.integers(0, 100)
            stems.add(f"{a}{b.capitalize()}" if n % 2 else f"{a}_{b}")
            if n % 7 == 0:
                c = rng.choice(syll)
                stems.add(f"{a}{b.capitalize()}{c.capitalize()}")
        _STEMS = sorted(stems)
    return _STEMS


def _gen_row(i: int, seed: int) -> tuple:
    """Pure function of (row index, seed) -> one corpus row."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    repo = f"org{i % 7}/repo{i % 23}"
    lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_W))]
    d = int(rng.integers(0, 40))
    name = f"mod{int(rng.integers(0, 997))}"
    path = f"src/dir{d}/{name}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}|{path}|{seed}".encode()).hexdigest()
    vocab = _vocab(seed)
    n_lines = int(rng.integers(10, 401))
    lines = []
    for _ in range(n_lines):
        n_words = int(rng.integers(2, 9))
        words = []
        for _ in range(n_words):
            # Zipf-like hot keywords: ~25% of word slots are hot terms
            if rng.random() < 0.25:
                words.append(_HOT[int(rng.zipf(2.0)) % len(_HOT)])
            else:
                words.append(vocab[int(rng.integers(0, len(vocab)))])
        lines.append(" ".join(words))
    return repo, path, commit, lang, "\n".join(lines)


def synthetic_code_corpus(spark: SparkSession, n_rows: int, seed: int = 42,
                          partitions: int | None = None) -> DataFrame:
    """Deterministic distributed synthetic source-code corpus (FIXTURES.md §1)."""
    partitions = partitions or max(8, n_rows // 2000)

    def gen(batches):
        for pdf in batches:
            rows = [_gen_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    base = spark.range(0, n_rows, numPartitions=partitions)
    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)


class _CacheHandle:
    """unpersist() all cached intermediates with one call (the contract
    callers of assign_doc_ids(cache=True) rely on)."""

    def __init__(self, *dfs):
        self._dfs = [d for d in dfs if d is not None]

    def unpersist(self):
        for d in self._dfs:
            d.unpersist()


def assign_doc_ids(df: DataFrame, keys: list[str] | None = None,
                   num_partitions: int | None = None,
                   dedup: bool = False,
                   cache: bool = False) -> DataFrame:
    """Deterministic dense docID = global rank by natural key, WITHOUT a
    single-partition window (SURVEY §7.4.1: the scale-safe two-pass scheme).

    1. repartitionByRange(keys) + sortWithinPartitions(keys [, content]):
       partitions are contiguous ranges of the total order, locally sorted.
    2. Count rows per partition (one cheap job), compute cumulative offsets.
    3. docID = offset[partition] + local row number (mapInPandas, zero-copy).

    dedup=True keeps one row per natural key — the lexicographically-least
    `content` — WITHOUT a separate shuffle: equal keys are adjacent after
    the range sort, so the winner falls out of the same pass (the
    deterministic version of Solr overwrite=true semantics, ref:
    scripts/add_histograms.py:40; the reference's last-write-wins is racy
    in its parallel indexer).

    cache=True persists the ranged/sorted intermediate so the count pass
    and the id pass don't recompute the shuffle; the handle is exposed as
    `._lsr_cached_part` on the result for the caller to unpersist.

    The result is independent of where range boundaries fall, so docIDs are
    stable across runs and cluster sizes — required for rank-identity and
    resumability. Ref analog: Lucene's internal docid assignment, consumed
    at LireRequestHandler.java:225.
    """
    keys = keys or ["repo", "path", "commit"]
    spark = df.sparkSession
    num_partitions = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    sort_cols = keys + (["content"] if dedup else [])
    part = df.repartitionByRange(int(num_partitions), *[F.col(k) for k in keys]) \
             .sortWithinPartitions(*sort_cols)
    if cache:
        part = part.persist()

    key_cols = list(keys)

    # ONE Python pass: dedup (if asked) + tag (partition id, local rank),
    # via mapInArrow — the wide `content` column stays in Arrow buffers
    # end-to-end (zero-copy); only the small key columns are materialized
    # for the consecutive-dedup comparison. mapInPandas here would convert
    # ~GBs of strings to Python objects and back for logic that never reads
    # them. The cross-batch guard keeps the output independent of Arrow
    # batch boundaries (docIDs must not depend on maxRecordsPerBatch).
    # The global offset is added afterwards as a pure JVM projection, so
    # the per-partition count job and the final id job share this pass's
    # output (cache=True).
    tag_schema = StructType(
        part.schema.fields
        + [StructField("_pid", LongType(), False),
           StructField("_lrn", LongType(), False)]
    )
    names = [f.name for f in tag_schema.fields]

    def tag(batch_iter):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        last_key = None
        for rb in batch_iter:
            if dedup and rb.num_rows:
                kcols = [rb.column(names.index(k)).to_pylist()
                         for k in key_cols]
                n = rb.num_rows
                keep = np.ones(n, dtype=bool)
                # row survives if ANY key column differs from its predecessor
                differs = np.zeros(max(n - 1, 0), dtype=bool)
                for c in kcols:
                    arr = np.array(c, dtype=object)
                    differs |= arr[1:] != arr[:-1]
                keep[1:] = differs
                first = tuple(c[0] for c in kcols)
                if last_key is not None and first == last_key:
                    keep[0] = False
                last_key = tuple(c[-1] for c in kcols)
                rb = rb.filter(pa.array(keep))
            m = rb.num_rows
            out = pa.RecordBatch.from_arrays(
                list(rb.columns)
                + [pa.array(np.full(m, pid, dtype=np.int64)),
                   pa.array(np.arange(seen, seen + m, dtype=np.int64))],
                names=names,
            )
            seen += m
            yield out

    local = part.mapInArrow(tag, tag_schema)
    if cache:
        local = local.persist()
    sizes = local.groupBy("_pid").count().collect()
    counts = {int(r["_pid"]): r["count"] for r in sizes}
    acc = 0
    offset_pairs = []
    for pid in sorted(counts):
        offset_pairs.extend([F.lit(pid), F.lit(acc)])
        acc += counts[pid]
    base = F.coalesce(
        F.create_map(*offset_pairs)[F.col("_pid")] if offset_pairs else F.lit(0),
        F.lit(0),
    )
    out = (
        local.withColumn("docID", (base + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn")
    )
    # NOTE (scale design, measured): the tag pass deliberately ships the
    # full rows through Arrow ONCE and caches its output. A "slim" variant
    # (keys-only through Python + monotonically_increasing_id + broadcast
    # mapping join) was tried and is ~2x SLOWER end-to-end: the
    # nondeterministic id expression forces the join + downstream
    # tokenize projection out of whole-stage codegen (interpreted regex,
    # 5x), and positional identity has no deterministic codegen-safe
    # substitute. The Arrow pass is embarrassingly parallel across executor
    # NODES (each brings its own loopback bandwidth); only a single box
    # serializes on it.
    out._lsr_cached_part = _CacheHandle(part, local) if cache else None
    return out


def load_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Load a persisted corpus: an Iceberg/catalog table identifier in
    production, a parquet path here — one seam, see sources/catalog.py."""
    from liresolr_spark.sources.catalog import read_corpus

    return read_corpus(spark, source)
