"""Pin the r4 bench drift: r3's 9-query layout vs r4's 13-query layout
on IDENTICAL code (canary-controlled paired runs, the curate_ab.json
methodology).

Background: BENCH_r04.json showed tile_pyramid +20% and three +6-12%
movers vs BENCH_r03.json despite a ~20% FASTER cpu canary, with no code
change to those queries. Two suspects: (a) the 13-query round-robin
interleaves more work between a query's reps (cache churn), (b) the new
ann/jpeg bench fixtures (100k-vector cache + 2k jpeg cache) add memory
pressure for everyone. Arms:

  r3_layout   — BENCH_QUERIES=<the 9 r3 queries>, fixtures skipped:
                reproduces the r3 bench shape exactly on today's code.
  r4_layout   — full 13-query run (the r4 shape).
  r3_fixtures — 9 r3 queries but BENCH_FORCE_FIXTURES=1: fixture cache
                pressure WITHOUT the interleave (run only if the first
                two arms disagree, to attribute the difference).

Arms alternate within each round so both draw from the same host-noise
windows; each run reports its own cpu canary. Compares the 7
baseline-comparable queries. Writes BENCH/bench_drift_ab.json.

Usage: python tools/bench_drift_ab.py [pairs=3] [arms=r3_layout,r4_layout]
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

R3_QUERIES = (
    "pip_broadcast,pip_partitioned,tile_pyramid,phash_neardup,"
    "minhash_lsh,cosine_topk,clip_segment,curate_images,validate_images"
)
COMPARE = [
    "pip_broadcast", "pip_partitioned", "tile_pyramid", "phash_neardup",
    "minhash_lsh", "cosine_topk", "clip_segment",
]
ARMS = {
    "r3_layout": {"BENCH_QUERIES": R3_QUERIES},
    "r4_layout": {},
    "r3_fixtures": {"BENCH_QUERIES": R3_QUERIES, "BENCH_FORCE_FIXTURES": "1"},
}


def run_arm(name: str) -> dict:
    env = dict(os.environ)
    env.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    env.update(ARMS[name])
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, check=True,
    ).stdout
    rec = json.loads(out.strip().splitlines()[-1])
    return {"queries": rec["queries"], "canary": rec["cpu_canary_sec"]}


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    arm_names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else ["r3_layout", "r4_layout"]
    )
    runs = {a: [] for a in arm_names}
    for i in range(pairs):
        for a in arm_names:  # alternate arms inside each round
            r = run_arm(a)
            runs[a].append(r)
            print(f"round {i} {a}: canary={r['canary']} "
                  + json.dumps({q: r["queries"].get(q) for q in COMPARE}),
                  flush=True)

    summary = {}
    for q in COMPARE:
        summary[q] = {
            a: round(min(r["queries"][q] for r in runs[a]), 3) for a in arm_names
        }
    first = arm_names[0]
    for q in COMPARE:
        base = summary[q][first]
        for a in arm_names[1:]:
            summary[q][f"{a}_vs_{first}"] = round(summary[q][a] / base, 3)
    rec = {
        "what": ("r4 bench drift A/B: same code, r3 9-query layout vs r4 "
                 "13-query layout (and optionally r3 layout + forced "
                 "fixtures), arms alternated per round, best-of-pairs "
                 "per arm, per-run cpu canary"),
        "pairs": pairs,
        "canaries": {a: [r["canary"] for r in runs[a]] for a in arm_names},
        "per_query_best": summary,
        "raw": {a: [r["queries"] for r in runs[a]] for a in arm_names},
    }
    out = os.path.join(REPO, "BENCH", "bench_drift_ab.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing[("+".join(arm_names))] = rec
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(rec["per_query_best"], indent=2))


if __name__ == "__main__":
    main()
