#!/usr/bin/env python3
"""Cross-round PLANAUDIT differ (VERDICT r12 item 8).

    python3 tools/planaudit_diff.py PLANAUDIT_r12.json PLANAUDIT_r13.json [--md] [--all]

Plan drift as a diffable number: for every query present in both
artifacts, print the per-counter deltas (shuffles xh/xr/x1, broadcasts
bc, exchange reuse, join mix smj/bhj/shj/bnlj/cart, window/ranked/topk
operators, scans, pushed-filter scans) — only queries whose counters
changed are shown unless --all.  Added/removed queries and the
run-level totals are summarized at the end.  A query that silently
gained a shuffle or lost filter pushdown between rounds shows up here
even when its wall time hides in the wobble band.
"""
import json
import sys

COUNTERS = ["xh", "xr", "x1", "bc", "reuse", "smj", "bhj", "shj",
            "bnlj", "cart", "win", "ranked", "topk", "wgl",
            "scans", "pushed"]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md = "--md" in sys.argv
    show_all = "--all" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    a = json.load(open(args[0]))
    b = json.load(open(args[1]))
    pa, pb = a["per_query"], b["per_query"]
    shared = sorted(k for k in pa if k in pb)
    added = sorted(set(pb) - set(pa))
    removed = sorted(set(pa) - set(pb))

    changed = []
    for q in shared:
        deltas = {c: pb[q].get(c, 0) - pa[q].get(c, 0) for c in COUNTERS}
        if show_all or any(deltas.values()):
            changed.append((q, deltas))

    sep = " | " if md else "  "
    if changed:
        hdr = ["query"] + COUNTERS
        if md:
            print("| " + " | ".join(hdr) + " |")
            print("|" + "---|" * len(hdr))
        else:
            print(sep.join(f"{h:>7}" if h != "query" else f"{h:<28}" for h in hdr))
        for q, d in changed:
            cells = [f"{q:<28}" if not md else q]
            for c in COUNTERS:
                v = d[c]
                cells.append(f"{v:+d}" .rjust(7) if v else ("." .rjust(7) if not md else "."))
            line = sep.join(cells)
            print(("| " + line + " |") if md else line)
    else:
        print("no per-query plan-shape drift between the two artifacts")

    def tot(art, key):
        return art.get(key, 0)

    print()
    for key in ["total_shuffles", "total_broadcasts", "total_windows"]:
        va, vb = tot(a, key), tot(b, key)
        print(f"{key}: {va} -> {vb} ({vb - va:+d})")
    for key in ["unguarded_cartesians"]:
        va, vb = a.get(key, []), b.get(key, [])
        if va or vb:
            print(f"{key}: {va} -> {vb}")
    if added:
        print("added queries:", ", ".join(added))
    if removed:
        print("removed queries:", ", ".join(removed))
    print(f"{len(changed)}/{len(shared)} shared queries drifted"
          + (" (--all shown)" if show_all else ""))


if __name__ == "__main__":
    main()
