"""Compose SCALING.json from the per-pair runs (SCALING_2_8.json headline,
SCALING_8_32.json secondary, SCALING_SF1.json large-corpus 8->32) plus the
criterion text and interpretation notes. Run after tools/scaling_run.py
has written the pair files:

  python tools/compose_scaling.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(name):
    p = os.path.join(REPO, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    d["N"] = d["levels"][0]["cores"]
    d["4N"] = d["levels"][1]["cores"]
    return d


def main() -> None:
    head = load("SCALING_2_8.json")
    sec = load("SCALING_8_32.json")
    sf1 = load("SCALING_SF1.json")
    out = {
        "criterion": (
            "indexing-throughput scaling efficiency >= 0.8 from N to 4N "
            "parallelism (north_rule); sandbox stand-in: same job, same "
            "input, local[N] vs local[4N], best-of-N fresh-JVM runs"),
        "headline_pair": head,
        "secondary_pair": sec,
        "sf1_pair": sf1,
        "notes": [],
    }
    if head:
        out["notes"].append(
            f"headline ({head['N']}->{head['4N']} cores, "
            f"{head['rows']} docs): build speedup "
            f"{head['build_speedup']}x, efficiency "
            f"{head['build_scaling_efficiency']}"
            + (" (criterion met)"
               if (head["build_scaling_efficiency"] or 0) >= 0.8 else ""))
        out["notes"].append(
            f"batched serving ({head['N']}->{head['4N']}): "
            f"{head['levels'][0].get('served_queries_per_sec')} -> "
            f"{head['levels'][1].get('served_queries_per_sec')} q/s "
            f"(speedup {head.get('served_speedup')}x)")
    if sec:
        out["notes"].append(
            f"secondary ({sec['N']}->{sec['4N']} cores, {sec['rows']} docs): "
            f"build speedup {sec['build_speedup']}x, efficiency "
            f"{sec['build_scaling_efficiency']} — all {sec['4N']} threads "
            "share one socket's memory bandwidth, a confound a multi-node "
            "cluster does not have (each executor node brings its own "
            "bandwidth)")
    if sf1:
        gbs = [lv.get("build_gb_per_sec") for lv in sf1["levels"]]
        out["notes"].append(
            f"sf1 ({sf1['N']}->{sf1['4N']} cores, {sf1['rows']} docs): "
            f"build speedup {sf1['build_speedup']}x, efficiency "
            f"{sf1['build_scaling_efficiency']}; build bytes moved per sec "
            f"{gbs[0]} -> {gbs[1]} GB/s (event-log task metrics: if the "
            "byte rate plateaus while cores quadruple, the wall is the "
            "single socket's memory/IO bandwidth, not the plan)")
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["notes"], indent=1))


if __name__ == "__main__":
    main()
