from liresolr_spark.streaming.ingest import (  # noqa: F401
    append_segment,
    incremental_index,
)
