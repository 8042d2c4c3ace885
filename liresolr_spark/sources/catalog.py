"""Corpus catalog seam: Iceberg tables in production, parquet fallback here.

The mandated input is an Iceberg table of source-code repositories
(repo, path, commit, lang, content); the reference's nearest analog is the
Solr update+commit cycle (ref: scripts/add_histograms.py:40 commitWithin),
which SURVEY §1.5 maps onto Iceberg snapshot appends. This module is the
single switch point:

- `resolve(source)` classifies a source string: anything containing a path
  separator or scheme is a FILE PATH (parquet); anything else is a TABLE
  IDENTIFIER (`catalog.db.table`) served by the session's configured
  catalog — for Iceberg, `spark.sql.catalog.<name> =
  org.apache.iceberg.spark.SparkCatalog` plus the iceberg-spark-runtime
  jar on the classpath.
- `read_corpus` / `write_corpus` dispatch on that classification. The
  table branch uses only the public DataFrameReader/V2-writer API
  (`spark.read.table`, `df.writeTo(t).append()`), so an Iceberg-backed
  deployment needs NO code change — point `source` at the table and the
  catalog does snapshot isolation, partition pruning on `repo`/`lang`,
  and atomic appends.

This sandbox ships no Iceberg runtime jar (and has no network to fetch
one), so the table branch cannot be exercised here; `iceberg_available`
reports that honestly and tests cover the dispatch logic plus the parquet
branch. The INDEX side keeps its own commit protocol (atomic meta.json
rename over partition-dir data files — see plans/build.py); on an Iceberg
deployment each index table (docstats/blocks/dictionary/manifest) would
instead be an Iceberg table and the meta commit a single multi-table
transaction or snapshot tag, which is the same shape with the ledger moved
into the catalog.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"

# file extensions that mark a source string as a DATA PATH even when it has
# no path separator (e.g. a bare relative 'corpus.parquet')
_DATA_EXTENSIONS = (".parquet", ".pq", ".orc", ".json", ".jsonl", ".csv",
                    ".avro", ".txt")

_IDENTIFIER_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){0,2}$")


def is_table_identifier(source: str) -> bool:
    """Classify a source string as catalog TABLE vs file PATH.

    An explicit `table:` prefix always means table. Otherwise a string is a
    table identifier only if it (a) has no path separator or scheme, (b) is
    not an existing local path, (c) does not end in a known data-file
    extension, and (d) shapes like a 1-3 part SQL identifier (`cat.db.t`).
    The extension/existence guards keep bare relative names like
    'corpus.parquet' or 'data_dir' on the parquet branch they historically
    used — catalog dispatch never hijacks a path-looking string."""
    if source.startswith("table:"):
        return True
    if "/" in source or "\\" in source or "://" in source:
        return False
    if source.lower().endswith(_DATA_EXTENSIONS):
        return False
    if os.path.exists(source):
        return False
    return bool(_IDENTIFIER_RE.match(source))


def _table_name(source: str) -> str:
    return source[len("table:"):] if source.startswith("table:") else source


def iceberg_available(spark: SparkSession, catalog: str | None = None) -> bool:
    """True iff an Iceberg catalog is configured AND its implementation
    class is loadable (runtime jar present)."""
    confs = spark.sparkContext.getConf().getAll()
    names = [k.split(".")[3] for k, v in confs
             if k.startswith("spark.sql.catalog.") and k.count(".") == 3
             and v == ICEBERG_CATALOG_IMPL]
    if catalog is not None and catalog not in names:
        return False
    if not names:
        return False
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CATALOG_IMPL)
        return True
    except Exception:
        return False


def read_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Load the corpus from an Iceberg/catalog table or a parquet path."""
    if is_table_identifier(source):
        return spark.read.table(_table_name(source))
    return spark.read.parquet(source)


def write_corpus(df: DataFrame, target: str, mode: str = "append") -> None:
    """Write corpus rows to an Iceberg/catalog table (V2 writer: atomic
    snapshot append / replace) or a parquet path (mode semantics)."""
    if is_table_identifier(target):
        writer = df.writeTo(_table_name(target))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(target)
