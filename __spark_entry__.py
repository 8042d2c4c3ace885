"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship BM25 top-k on sf0.001; `queries()` /
`oracle_sql()` expose the oracle-checked operator registry (implemented in
liresolr_spark.entry_queries — one entry per SURVEY.md §2 operator family).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: OR-of-terms BM25 top-k over
    the documents table (the /lireq analog)."""
    from liresolr_spark.entry_queries import queries as _qs

    return _qs()["q01_bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from liresolr_spark.entry_queries import queries as _qs

    return _qs()


def oracle_sql() -> dict[str, str]:
    from liresolr_spark.entry_queries import oracle_sql as _os

    return _os()
