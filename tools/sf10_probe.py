#!/usr/bin/env python3
"""sf1 -> sf10 superlinear-risk probe (VERDICT r12 item 5).

The 10x story (sf0.1 -> sf1) is measured every round; 100x is
extrapolated.  This probe adds one more measured decade for the five
heads whose work is answer- or density-driven, against the
tools/gen_probe.py sf10 subset (documents/embeddings x10 with
per-replica token salting, lineitem/part x3 sharing the interval
space — see gen_sf10's docstring for why those constructions).

Both scales run back-to-back in ONE window with the SAME jar
(graft.Bench restricted to the query list, fresh JVM per scale,
empty cwd so no burst-retry logic fires).  The artifact records the
medians, the ratio, the data growth per query's input tables, and the
per-invocation CPU-probe medians as the contention indicator.

  python3 tools/sf10_probe.py <sf1_dir> <sf10_dir> <jar> <out_json> [reps]
"""
import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_probe import lineage_env, run_bench  # noqa: E402

QUERIES = ["q_range_join", "q_simhash_hamming_count", "q_ngram_jaccard",
           "q_dup_substring", "q_dedup_minhash"]

# data growth sf1 -> sf10 per query (input rows), from gen_sf10's plan
DATA_GROWTH = {
    "q_range_join": 3.0,            # lineitem/part x3 (pairs x9 by design)
    "q_simhash_hamming_count": 10.0,
    "q_ngram_jaccard": 10.0,
    "q_dup_substring": 10.0,
    "q_dedup_minhash": 10.0,
}


def main():
    sf1_dir, sf10_dir, jar, out_json = sys.argv[1:5]
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    loadavg0 = open("/proc/loadavg").read().split()[0]
    meds = {d: {q: [] for q in QUERIES} for d in (sf1_dir, sf10_dir)}
    probes = {d: [] for d in (sf1_dir, sf10_dir)}
    with tempfile.TemporaryDirectory(prefix="sf10_probe_") as workdir:
        for rep in range(reps):
            dirs = [sf1_dir, sf10_dir] if rep % 2 == 0 else [sf10_dir, sf1_dir]
            for d in dirs:
                art, _ = run_bench(jar, d, QUERIES, workdir)
                pvals = sorted(v for v in art.get("probe", {}).values() if v > 0)
                probes[d].append(round(pvals[len(pvals) // 2], 4) if pvals else None)
                for q in QUERIES:
                    v = art.get("queries", {}).get(q)
                    if v is not None and v > 0:
                        meds[d][q].append(v)
                print(f"rep {rep + 1}/{reps} {os.path.basename(d)}: " + " ".join(
                    f"{q}={art.get('queries', {}).get(q)}" for q in QUERIES),
                    flush=True)
    per_query = {}
    for q in QUERIES:
        a, b = meds[sf1_dir][q], meds[sf10_dir][q]
        ma = statistics.median(a) if a else None
        mb = statistics.median(b) if b else None
        per_query[q] = {
            "sf1_meds": a, "sf10_meds": b,
            "sf1_med": ma, "sf10_med": mb,
            "ratio": (mb / ma) if (ma and mb) else None,
            "data_growth": DATA_GROWTH[q],
        }
    result = {
        "metric": "sf1_to_sf10_med_ratio",
        "reps": reps,
        "queries": per_query,
        "probe_medians": {os.path.basename(k): v for k, v in probes.items()},
        "loadavg_start": loadavg0,
        "loadavg_end": open("/proc/loadavg").read().split()[0],
        "env": lineage_env([jar]),
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({q: round(per_query[q]["ratio"], 2) if per_query[q]["ratio"]
                      else None for q in QUERIES}))
    print("wrote", out_json)


if __name__ == "__main__":
    main()
