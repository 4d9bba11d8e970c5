"""Driver blind-spot report: which registered queries have NEVER been
sampled by the driver's per-round correctness gate (CORRECTNESS_r*.json)?

The local round-exit gate sweeps all queries at both SFs, but the
driver only samples ~50 per round — this report makes explicit which
queries are standing ONLY on the local sweep + committed manifest, so
the per-round value of the monolithic sweep is visible and the list
shrinks as driver samples accumulate.

Usage: python tools/blind_spots.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pipeline_query_engine_demo_spark.plans import REGISTRY

    sampled: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_") : -len(".json")]
        for name in json.load(open(path)):
            sampled.setdefault(name, []).append(rnd)

    never = sorted(set(REGISTRY) - set(sampled))
    stale = sorted(set(sampled) - set(REGISTRY))
    by_cat: dict[str, list[str]] = {}
    for name in never:
        by_cat.setdefault(REGISTRY[name].category, []).append(name)

    print(
        f"{len(REGISTRY)} registered; {len(set(sampled) & set(REGISTRY))} "
        f"driver-sampled across {len(glob.glob(os.path.join(REPO, 'CORRECTNESS_r*.json')))} "
        f"rounds; {len(never)} NEVER sampled:"
    )
    for cat in sorted(by_cat):
        print(f"  [{cat}] ({len(by_cat[cat])}): {', '.join(by_cat[cat])}")
    if stale:
        print(f"sampled names no longer registered (renamed?): {stale}")


if __name__ == "__main__":
    main()
