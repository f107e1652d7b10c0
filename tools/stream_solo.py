#!/usr/bin/env python3
"""Solo fresh-JVM micro16 StreamBench (VERDICT r17 item 7).

STREAMMODEPROBE_r17 settled that the in-suite micro16 totals carry a
persistent environmental ~1.2x floor plus 2-4 random per-run burst
victims (solo fresh-JVM per-op runs reproduce neither and are stable
to a few percent), so from r18 the COMMITTED micro16 metric is the
sum of solo fresh-JVM per-op medians: each operator runs alone in its
own JVM (graft.StreamBench restricted to that op — the same binary,
batching and noop-sink protocol as the suite), `reps` times, and the
composed artifact line carries the per-op medians, every rep, and the
usual probe/lineage env block.  The long-JVM in-suite run stays as a
secondary regime line (micro16_sf01_insuite) so the aging/floor
evidence keeps accruing.

Per-child gating: each child inherits SPARK_GRAFT_PROBE_GATE (via
SPARK_GRAFT_PREV_STREAMBENCH pointing at the chosen anchor artifact),
so a mid-queue contention burst stalls ONE ~1-minute op-run, not a
45-minute suite; gate-aborted children (exit 3) are retried after a
cool-down, then run ungated with their honest suspect flag.

  python3 tools/stream_solo.py <sf_dir> <out_json> <jar> [reps] \
      [-- op1 op2 ...]

Env: SPARK_GRAFT_PROBE_GATE (child pre-gate ratio, recommended 1.2),
SPARK_GRAFT_STREAM_BATCHES (default 16), SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_PREV_STREAMBENCH (anchor override; default = highest-round
STREAMBENCH_r*.json in the repo root carrying a suspect:false line for
the anchor regime, falling back to any line of that regime).
"""
import json
import os
import re
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_probe import ADD_OPENS, lineage_env  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGIME = "micro16_sf01"

# the suite's full op list (mirrors StreamBench.cases — keep in sync;
# a missing op here silently shrinks the headline, so the composed
# artifact also records the op list it ran)
OPS = [
    "stream_windowed_counts", "stream_sessionize", "stream_asof_enrich",
    "stream_dedup", "stream_funnel", "stream_retention",
    "stream_active_users", "stream_release_filter",
    "stream_pii_scan", "stream_quality_hist", "stream_near_dedup",
    "stream_image_near_dedup", "stream_quality_gate", "stream_token_budget",
    "stream_heavy_hitters", "stream_weighted_sample", "stream_thumbnail",
    "stream_thumbnail_rgb", "stream_audio_energy", "stream_zorder_sink",
]


def pick_anchor(regime):
    """Highest-round STREAMBENCH_r*.json whose `regime` line exists,
    preferring rounds whose line is suspect:false (the graft
    pickAnchor discipline, python spelling)."""
    if os.environ.get("SPARK_GRAFT_PREV_STREAMBENCH"):
        return os.environ["SPARK_GRAFT_PREV_STREAMBENCH"]
    best = {}
    for f in os.listdir(REPO):
        m = re.fullmatch(r"STREAMBENCH_r(\d+)\.json", f)
        if not m:
            continue
        try:
            for ln in open(os.path.join(REPO, f)):
                if f'"regime":"{regime}"' not in ln:
                    continue
                d = json.loads(ln)
                # ADVICE r18: a multi-line artifact's cleanliness is
                # any(regime line suspect:false), not the LAST line —
                # never let a trailing suspect line demote a round that
                # also carries a clean one (or vice versa)
                rnd = int(m.group(1))
                clean_line = not d.get("suspect", True)
                prev_clean = best.get(rnd, (False, None))[0]
                best[rnd] = (prev_clean or clean_line,
                             os.path.join(REPO, f))
        except Exception:
            pass
    if not best:
        return None
    clean = {r: v for r, v in best.items() if v[0]}
    pool = clean or best
    return pool[max(pool)][1]


def run_child(jar, sf_dir, op, workdir, gated, anchor):
    out = os.path.join(workdir, "sb_out.json")
    if os.path.exists(out):
        os.remove(out)
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", p + "=ALL-UNNAMED"]
    cmd += ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-Xmx" + os.environ.get("SPARK_DRIVER_MEM", "8g"),
            "-cp", "/opt/spark/jars/*:" + jar, "graft.StreamBench", op]
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = env.get("SPARK_GRAFT_CPUS", "32")
    env["SPARK_GRAFT_STREAM_BATCHES"] = env.get(
        "SPARK_GRAFT_STREAM_BATCHES", "16")
    # the child's anchor lookup + pre-gate read the REGIME-matching
    # line of the anchor file; the committed solo line carries the
    # plain regime name so future rounds anchor on it directly
    env["SPARK_GRAFT_STREAM_REGIME"] = REGIME
    env["SPARK_GRAFT_BENCH_OUT"] = out
    if anchor:
        env["SPARK_GRAFT_PREV_STREAMBENCH"] = anchor
    if not gated:
        env.pop("SPARK_GRAFT_PROBE_GATE", None)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=workdir, env=env,
                       capture_output=True, text=True, timeout=1800)
    wall = time.time() - t0
    if r.returncode == 3:
        return None, wall  # pre-gate abort: bad window, retry later
    if r.returncode != 0 or not os.path.exists(out):
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:] + "\n")
        raise RuntimeError(f"StreamBench {op} failed (rc={r.returncode})")
    with open(out) as f:
        return json.load(f), wall


def main():
    argv = sys.argv[1:]
    ops = OPS
    if "--" in argv:
        i = argv.index("--")
        argv, ops = argv[:i], argv[i + 1:]
    sf_dir, out_json, jar = argv[0], argv[1], argv[2]
    reps = int(argv[3]) if len(argv) > 3 else 3
    anchor = pick_anchor(REGIME)
    gate = os.environ.get("SPARK_GRAFT_PROBE_GATE")
    print(f"anchor={anchor} gate={gate} reps={reps} ops={len(ops)}",
          flush=True)

    loadavg0 = open("/proc/loadavg").read().split()[0]
    per_op = {op: [] for op in ops}  # list of child artifacts
    walls = []
    t_start = time.time()
    with tempfile.TemporaryDirectory(prefix="stream_solo_") as workdir:
        for rep in range(reps):
            for op in ops:
                art = None
                for attempt in range(4):
                    gated = gate is not None and attempt < 3
                    art, wall = run_child(jar, sf_dir, op, workdir,
                                          gated, anchor)
                    walls.append(round(wall, 1))
                    if art is not None:
                        break
                    print(f"  {op} rep{rep + 1}: gate abort "
                          f"(attempt {attempt + 1}), cooling down",
                          flush=True)
                    time.sleep(60)
                per_op[op].append(art)
                o = art["operators"][op]
                print(f"rep {rep + 1}/{reps} {op}: sec={o['sec']} "
                      f"probe={o['probe']} suspect={art['suspect']}",
                      flush=True)
                time.sleep(5)  # drain the 32-thread tail a little
    loadavg1 = open("/proc/loadavg").read().split()[0]

    # compose: per-op entry = the MEDIAN-sec rep's operator block,
    # annotated with every rep's sec/probe and its suspect count
    operators = {}
    probes_all, pars_all = [], []
    n_suspect_ops = 0
    for op in ops:
        arts = [a for a in per_op[op] if a is not None]
        secs = [a["operators"][op]["sec"] for a in arts]
        med_art = sorted(arts, key=lambda a: a["operators"][op]["sec"])[
            len(arts) // 2]
        ent = dict(med_art["operators"][op])
        ent["secs"] = secs
        ent["suspect_reps"] = sum(1 for a in arts if a.get("suspect"))
        if ent["suspect_reps"] > len(arts) // 2:
            n_suspect_ops += 1
        operators[op] = ent
        probes_all += [a["env"]["probe_median_sec"] for a in arts]
        pars_all += [a["env"]["probe_par_sec"] for a in arts]
    total = sum(o["sec"] for o in operators.values())
    probe_median = statistics.median(probes_all)
    # ADVICE r18: this aggregates ~reps×ops child probes; the MIN of
    # many draws sits systematically below one draw, so comparing it
    # symmetrically against the anchor's single-run probe_par_sec
    # persistently flags clean solo runs.  Use the MEDIAN for the
    # anchor comparison (and emit it as probe_par_sec so future
    # anchors compare median-to-median); keep the min as a separate
    # best-window witness field.
    probe_par = statistics.median(pars_all)
    probe_par_min = min(pars_all)

    reasons = []
    if anchor:  # run-level anchor check, mirroring the Scala reasons
        try:
            for ln in open(anchor):
                if f'"regime":"{REGIME}"' in ln:
                    prev = json.loads(ln)
                    pm = prev["env"]["probe_median_sec"]
                    pp = prev["env"].get("probe_par_sec")
                    if pm and abs(probe_median / pm - 1.0) > 0.25:
                        reasons.append(
                            f"probe median {probe_median:.3f}s is "
                            f"{probe_median / pm:.2f}x the anchor's "
                            f"({pm:.3f}s in {os.path.basename(anchor)}"
                            + (", itself suspect" if prev.get("suspect")
                               else "") + ")")
                    # slow direction only (ADVICE r18): a faster-than-
                    # anchor parallel probe is a good window, not a
                    # reason to distrust the run
                    if pp and probe_par / pp - 1.0 > 0.25:
                        reasons.append(
                            f"parallel probe {probe_par:.3f}s is "
                            f"{probe_par / pp:.2f}x the anchor's "
                            f"({pp:.3f}s in {os.path.basename(anchor)})")
                    break
        except Exception as e:
            reasons.append(f"anchor read failed: {e}")
    if n_suspect_ops > max(2, len(ops) // 10):
        reasons.append(f"{n_suspect_ops} ops suspect in a majority of "
                       "their solo reps")

    env = lineage_env([jar])
    env.update({
        "probe_median_sec": probe_median,
        "probe_par_sec": probe_par,
        "probe_par_min_sec": probe_par_min,
        "loadavg_start": loadavg0, "loadavg_end": loadavg1,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "micro_batches": int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES",
                                            "16")),
        "anchor": anchor, "gate": gate,
        "wall_total_sec": round(time.time() - t_start, 1),
        "invocation_walls_sec": walls,
    })
    line = {
        "metric": "stream_total", "value": total, "unit": "sec",
        "regime": REGIME, "mode": "solo_fresh_jvm", "reps": reps,
        "operators": operators, "suspect": bool(reasons),
        "partially_suspect": n_suspect_ops > 0,
        "suspect_reasons": reasons, "env": env, "sf": sf_dir,
    }
    with open(out_json, "w") as f:
        f.write(json.dumps(line, separators=(",", ":")) + "\n")
    print(json.dumps({"value": round(total, 1), "suspect": bool(reasons),
                      "reasons": reasons}))
    print("wrote", out_json)


if __name__ == "__main__":
    main()
