from liresolr_spark.plans.build import IndexMeta, build_index, read_meta  # noqa: F401
