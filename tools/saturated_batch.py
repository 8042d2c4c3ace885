"""Saturated-batch serving throughput at one parallelism level.

The 240-query batch in tools/scaling_run.py under-fills 32 cores on the
240k-doc index (fixed per-job DAG latency dominates); this measures the
960-query point used for the BASELINE.md saturated-batch row. Fresh JVM
per invocation, same query mix as scaling_run, min-of-N repeats reported
along with each raw timing.

Usage:
  python tools/saturated_batch.py --cores 8  --rows 240000
  python tools/saturated_batch.py --cores 32 --rows 240000
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(cores: int, rows: int, nq: int) -> None:
    import time

    sys.path.insert(0, REPO)
    from liresolr_spark.api import LireQueryEngine
    from liresolr_spark.session import get_spark
    from liresolr_spark.ship import ship_package
    from tools.scaling_run import QUERY_BATCH

    spark = get_spark(f"satbatch-{cores}", cores=cores,
                      shuffle_partitions=cores)
    ship_package(spark)
    idx = f"/tmp/liresolr_scaling_index_{rows}_{cores}"
    if not os.path.exists(os.path.join(idx, "meta.json")):
        raise SystemExit(f"no index at {idx}; run tools/scaling_run.py first")
    eng = LireQueryEngine(spark, idx)
    texts = {f"q{i}": QUERY_BATCH[i % len(QUERY_BATCH)] + f" mod{i % 7}"
             for i in range(nq)}
    eng.search(text=QUERY_BATCH[0], rows=5).collect()  # warm indexed terms
    t0 = time.time()
    eng.search_many(texts, rows=10).collect()
    dt = time.time() - t0
    print(json.dumps({"cores": cores, "rows": rows, "queries": nq,
                      "sec": round(dt, 3),
                      "qps": round(nq / dt, 2)}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=240000)
    ap.add_argument("--queries", type=int, default=960)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        child(args.cores, args.rows, args.queries)
        return
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    runs = []
    for _ in range(args.repeats):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--cores", str(args.cores), "--rows", str(args.rows),
             "--queries", str(args.queries)],
            capture_output=True, text=True, check=True, env=env)
        last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        runs.append(json.loads(last))
    best = min(runs, key=lambda r: r["sec"])
    print(json.dumps({**best, "raw_secs": [r["sec"] for r in runs]}))


if __name__ == "__main__":
    main()
