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

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"


def is_table_identifier(source: str) -> bool:
    """Table identifiers (`cat.db.t`) have no path separators or scheme."""
    return "/" not in source and "\\" not in source and "://" not in source


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
        return spark.read.table(source)
    return spark.read.parquet(source)


def write_corpus(df: DataFrame, target: str, mode: str = "append") -> None:
    """Write corpus rows to an Iceberg/catalog table (V2 writer: atomic
    snapshot append / replace) or a parquet path (mode semantics)."""
    if is_table_identifier(target):
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(target)
