#!/usr/bin/env python3
"""Per-query scale-ratio table from two graft.Bench artifacts.

    python3 tools/ratio.py BENCH_SF01_r09.json BENCH_SF1_r09.json [--md]

Prints each query's median seconds at both scales and the ratio
(second / first), sorted by ratio descending, plus the summary the
SURVEY scale notes quote (median/max ratio, count above 10x).  Queries
missing from either artifact (e.g. guarded all-pairs baselines that
refuse to plan at the larger scale) are listed separately.
"""
import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md = "--md" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    a = json.load(open(args[0]))
    b = json.load(open(args[1]))
    qa, qb = a["queries"], b["queries"]
    shared = sorted(
        (k for k in qa if k in qb and qa[k] > 0 and qb[k] > 0),
        key=lambda k: qb[k] / qa[k], reverse=True)
    missing = sorted(set(qa) ^ set(qb))
    ratios = [qb[k] / qa[k] for k in shared]
    ratios_sorted = sorted(ratios)
    med = ratios_sorted[len(ratios_sorted) // 2] if ratios_sorted else 0.0

    # inline trust labels: a query probe-flagged in either artifact is
    # marked on its own row so the reader never has to cross-reference
    # the suspect_queries footer by hand (VERDICT r11 item 7)
    sqa = a.get("suspect_queries") or {}
    sqb = b.get("suspect_queries") or {}
    # burst_unresolved (r18 VERDICT item 3): keys whose retry CONFIRMED
    # the headline med as a contention burst but could not substitute it
    # (retry >= warmMin).  Their med is knowingly inflated — totals
    # below are printed both as-is and with the artifact's own min
    # substituted for these keys.
    bua = set(a.get("burst_unresolved") or [])
    bub = set(b.get("burst_unresolved") or [])
    mina, minb = a.get("min") or {}, b.get("min") or {}

    def flag(k: str) -> str:
        tags = ((["A!"] if k in sqa else []) + (["B!"] if k in sqb else [])
                + (["Ab"] if k in bua else []) + (["Bb"] if k in bub else []))
        return " [%s]" % ",".join(tags) if tags else ""

    if md:
        print("| query | %s s | %s s | ratio |" % (a.get("sf", "a"), b.get("sf", "b")))
        print("|---|---|---|---|")
        for k in shared:
            print("| %s%s | %.2f | %.2f | %.1fx |" % (k, flag(k), qa[k], qb[k], qb[k] / qa[k]))
    else:
        for k in shared:
            print("%-24s %8.2fs %8.2fs %6.1fx%s" % (k, qa[k], qb[k], qb[k] / qa[k], flag(k)))
    if sqa or sqb:
        print("\n[A!]/[B!] = probe-flagged in that artifact (localized "
              "contention; distrust that row's side)")
    if bua or bub:
        print("[Ab]/[Bb] = burst-unresolved in that artifact (retry "
              "confirmed the med as a burst; min is the honest value)")
    print()
    print("queries=%d median_ratio=%.2fx max_ratio=%.1fx above_10x=%d" % (
        len(shared), med, max(ratios) if ratios else 0,
        sum(1 for r in ratios if r > 10)))
    print("headline (%s vs %s): %.1fs -> %.1fs (%.2fx)" % (
        a.get("metric", "total"), b.get("metric", "total"),
        a["value"], b["value"], b["value"] / a["value"] if a["value"] else 0))
    # apples-to-apples across the r14 schema change ("value" became the
    # scale-path-only total): recompute both totals from the shared
    # query set, with and without the declared quadratic baselines
    base = set(a.get("baseline_queries") or []) | set(b.get("baseline_queries") or [])
    ta, tb = sum(qa[k] for k in shared), sum(qb[k] for k in shared)
    print("common-key totals: %.1fs -> %.1fs (%.2fx)" % (ta, tb, tb / ta if ta else 0))
    if bua or bub:
        # min-substitute the burst-unresolved keys (each side uses its
        # own min for its own flagged keys; other keys keep their med)
        sa = sum(mina.get(k, qa[k]) if k in bua else qa[k] for k in shared)
        sb = sum(minb.get(k, qb[k]) if k in bub else qb[k] for k in shared)
        print("common-key totals, burst-unresolved min-substituted "
              "(A:%s B:%s): %.1fs -> %.1fs (%.2fx)" % (
                  ",".join(sorted(bua)) or "-", ",".join(sorted(bub)) or "-",
                  sa, sb, sb / sa if sa else 0))
    for side, art in (("A", a), ("B", b)):
        if art.get("burst_retry_cap_hit"):
            print("WARNING %s: burst retry cap (%s) EXHAUSTED — later "
                  "bursts got no retry" % (side, art.get("burst_retry_cap")))
    if base:
        sa = sum(qa[k] for k in shared if k not in base)
        sb = sum(qb[k] for k in shared if k not in base)
        print("common-key scale-path totals (excl %s): %.1fs -> %.1fs (%.2fx)" % (
            ", ".join(sorted(base)), sa, sb, sb / sa if sa else 0))
    for art in (a, b):
        if art.get("suspect"):
            print("SUSPECT %s: %s" % (art.get("sf"), art.get("suspect_reasons")))
        elif art.get("partially_suspect"):
            print("PARTIALLY SUSPECT %s (localized contention; distrust "
                  "the named rows only)" % art.get("sf"))
        sq = art.get("suspect_queries") or {}
        if sq:
            print("  suspect queries: %s" % sq)
        env = art.get("env") or {}
        pvp = env.get("probe_vs_prev")
        if pvp:
            par = (" par=%.2fx" % pvp["par_ratio"]) if "par_ratio" in pvp else ""
            print("probe anchor %s: %.4fs vs %.4fs (%s%s) = %.2fx%s" % (
                art.get("sf"), env.get("probe_median_sec", -1),
                pvp["prev_probe_median_sec"], pvp["prev_file"],
                ", prev suspect" if pvp.get("prev_suspect") else "",
                pvp["ratio"], par))
    if missing:
        print("only in one artifact (guards differ?): %s" % ", ".join(missing))


if __name__ == "__main__":
    main()
