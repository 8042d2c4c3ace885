"""Ship the liresolr_spark package to Spark executors.

The spark-submit deployment is `--py-files liresolr_spark.zip` (north_rule);
in embedded/driver-API contexts this helper is the programmatic equivalent:
zip the package once and addPyFile it, so mapInPandas/applyInPandas kernels
that reference the package unpickle on workers regardless of the worker's
PYTHONPATH.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "liresolr_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)
