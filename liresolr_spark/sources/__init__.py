from liresolr_spark.sources.corpus import (  # noqa: F401
    assign_doc_ids,
    load_corpus,
    synthetic_code_corpus,
)
