#!/usr/bin/env python3
"""sf1 -> sf10 scale probe for the r14 media operators.

The pixel/video/audio keys are scan-local by construction (decode +
featurize inside one flatMap, only narrow checksum columns leave the
stage), so their wall time should scale ~linearly in document count.
This probe MEASURES that claim across a decade the way SF10PROBE_r13
did for the dedup heads: both scales run in ONE window with the same
jar (fresh JVM per invocation via ab_probe.run_bench, scales
ABBA-alternated across reps), medians + per-invocation CPU-probe
medians recorded.

The sf10 set (tools/gen_probe.py sf10) carries documents x10, and
every media fixture derives from doc_id arithmetic, so x10 docs =
x10 media payloads end to end.

  python3 tools/media_probe.py <sf1_dir> <sf10_dir> <jar> <out_json> [reps]
"""
import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_probe import lineage_env, run_bench  # noqa: E402

QUERIES = ["q_thumbnail", "q_thumbnail_rgb", "q_thumbnail_mixed",
           "q_frame_sample", "q_audio_energy", "q_audio_meta",
           "q_multimodal_meta",
           # r15 additions: the mixed audio-container gate and the
           # image near-dup COUNT form (the declared scale shape; the
           # pair form is output-bound by its own answer, like P52)
           "q_audio_mixed", "q_image_dedup_count",
           # late-r15: the audio/video near-dup scale shapes (count
           # form / pair-aggregated form — scan-local fingerprints,
           # banded or sig-keyed joins, nothing pairwise)
           "q_audio_dedup_count", "q_video_dedup",
           # r16: the image/audio PAIR forms (VERDICT r15 item 5 —
           # only the count forms were probed, so sig-vocabulary
           # saturation at sf10 was assumed, not measured) and the
           # hamming-tolerant video match
           "q_image_dedup", "q_audio_dedup", "q_video_dedup_tol",
           # r17 (VERDICT r16 item 3): the CC keep-list keys — the
           # loop is where superlinearity would hide (rounds grow with
           # component diameter, pair volume, label skew), and these
           # were the only media keys with unmeasured x10 behavior —
           # plus the new video keep-list
           "q_image_cluster_keep", "q_audio_cluster_keep",
           "q_video_cluster_keep",
           # r18 (VERDICT r17 items 1+4): the dup-heavy video corpus
           # (k identical uploads — the regime that OOM'd the doc-pair
           # CC; the frame-set graph must hold it linear) and the
           # composed multimodal release filter (two CC loops in one
           # key — previously the only media key with no x10 row)
           "q_video_cluster_keep_dup", "q_release_filter_media"]
DATA_GROWTH = 10.0  # documents x10


def main():
    global QUERIES
    sf1_dir, sf10_dir, jar, out_json = sys.argv[1:5]
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    # optional trailing query list: probe a subset (e.g. re-measuring
    # the keep keys after the sig-graph CC fix without re-running the
    # unchanged scan-local rows)
    if len(sys.argv) > 6:
        QUERIES = sys.argv[6:]
    loadavg0 = open("/proc/loadavg").read().split()[0]
    meds = {d: {q: [] for q in QUERIES} for d in (sf1_dir, sf10_dir)}
    probes = {d: [] for d in (sf1_dir, sf10_dir)}
    with tempfile.TemporaryDirectory(prefix="media_probe_") as workdir:
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
    loadavg1 = open("/proc/loadavg").read().split()[0]

    per_query = {}
    for q in QUERIES:
        a = statistics.median(meds[sf1_dir][q]) if meds[sf1_dir][q] else None
        b = statistics.median(meds[sf10_dir][q]) if meds[sf10_dir][q] else None
        per_query[q] = {
            "sf1_med_sec": a, "sf10_med_sec": b,
            "wall_ratio": (b / a) if (a and b) else None,
            "data_growth": DATA_GROWTH,
            "vs_linear": (b / a / DATA_GROWTH) if (a and b) else None,
        }
    result = {
        "metric": "media_scale_probe",
        "sf1_dir": sf1_dir, "sf10_dir": sf10_dir, "reps": reps,
        "queries": per_query,
        "probe_medians": probes,
        "loadavg_start": loadavg0, "loadavg_end": loadavg1,
        "env": lineage_env([jar]),
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({q: per_query[q]["wall_ratio"] for q in QUERIES}))
    print("wrote", out_json)


if __name__ == "__main__":
    main()
