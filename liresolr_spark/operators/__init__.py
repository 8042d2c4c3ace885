from liresolr_spark.operators.bm25 import (  # noqa: F401
    bm25_score_corpus,
    bm25_topk_from_index,
    idf_lucene,
)
from liresolr_spark.operators.wand import wand_topk  # noqa: F401
