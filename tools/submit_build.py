"""spark-submit entry point for the index build (north_rule deployment:
`spark-submit --py-files liresolr_spark.zip tools/submit_build.py ...`).

On a real cluster:

  cd /root/repo && zip -r /tmp/liresolr_spark.zip liresolr_spark
  spark-submit --master <cluster> \
      --py-files /tmp/liresolr_spark.zip \
      tools/submit_build.py \
      --corpus <iceberg-or-parquet-path> --index <output-dir> \
      --num-shards 4096 --block-size 128 --shard-waves 16

The script only uses the already-active session (spark-submit owns master/
executor config); locally it falls back to the same get_spark the tests use,
so the file doubles as a CLI build runner in this sandbox:

  python tools/submit_build.py --corpus /tmp/corpus --index /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="corpus table path (parquet dir; Iceberg table in prod)")
    ap.add_argument("--index", required=True, help="index output directory")
    ap.add_argument("--num-shards", type=int, default=32)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--shard-waves", type=int, default=1,
                    help=">1 commits lineage per wave (finer resume grain)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--no-hash-tokens", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is None:  # not under spark-submit: local fallback
        from liresolr_spark.session import get_spark

        active = get_spark("liresolr-build")
    from liresolr_spark.plans.build import build_index
    from liresolr_spark.ship import ship_package

    ship_package(active)
    corpus = active.read.parquet(args.corpus)
    metrics = build_index(
        corpus, args.index,
        num_shards=args.num_shards, block_size=args.block_size,
        resume=not args.no_resume,
        with_hash_tokens=not args.no_hash_tokens,
        shard_waves=args.shard_waves,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
