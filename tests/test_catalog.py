"""Catalog seam (Iceberg-in-production, parquet-here): source-string
dispatch, parquet round-trip through the seam, and an honest probe for the
(absent) Iceberg runtime. See sources/catalog.py and README's Iceberg
section for the production wiring."""

from __future__ import annotations

from liresolr_spark.sources.catalog import (
    is_table_identifier,
    iceberg_available,
    read_corpus,
    write_corpus,
)


def test_source_classification():
    assert is_table_identifier("lake.db.corpus")
    assert is_table_identifier("corpus")
    assert not is_table_identifier("/data/corpus.parquet")
    assert not is_table_identifier("s3://bucket/corpus")
    assert not is_table_identifier("data\\corpus")


def test_parquet_roundtrip_through_seam(spark, corpus200, tmp_path):
    target = str(tmp_path / "corpus_out")
    write_corpus(corpus200, target, mode="overwrite")
    back = read_corpus(spark, target)
    assert back.count() == corpus200.count()
    assert set(back.columns) == set(corpus200.columns)
    # append mode appends
    write_corpus(corpus200.limit(10), target, mode="append")
    assert read_corpus(spark, target).count() == corpus200.count() + 10


def test_iceberg_probe_honest(spark):
    # no catalog configured and no runtime jar in this sandbox: the probe
    # must say so rather than pretend
    assert iceberg_available(spark) is False
