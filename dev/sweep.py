#!/usr/bin/env python3
"""Superlinearity sweep over two bench detail artifacts (dev tooling).

Compares per-query graded times, first_run times, and memo_builds
(aggregated by family prefix) between a small-SF and a large-SF bench
run, prints the top ratios, and flags anything above the threshold —
the r12 audit (docs/SCALE.md "Round-12 superlinearity sweep") as a
repeatable command instead of a one-shot notebook.

Usage:
  python3 dev/sweep.py <detail_small_sf.json> <detail_large_sf.json> [flag_ratio]

The flag ratio defaults to 12 for a 10x data step: at these absolute
sizes (sub-second queries) fixed stage overhead dominates, so honest
linear scaling shows well UNDER the data ratio; 12x headroom only
trips on genuinely superlinear growth.
"""
import json
import sys


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    lo = json.load(open(sys.argv[1]))
    hi = json.load(open(sys.argv[2]))
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    print(f"small: {lo['sf']}  total {lo['value']}s  load {lo['loadavg_start']}")
    print(f"large: {hi['sf']}  total {hi['value']}s  load {hi['loadavg_start']}")
    if lo.get("degraded") or hi.get("degraded"):
        print(f"WARNING: degraded runs — small={lo.get('degraded')} "
              f"large={hi.get('degraded')}; ratios on those queries are noise")

    def ratios(a, b, min_base):
        out = []
        for q, t in a.items():
            u = b.get(q)
            if t and u and t > min_base and u > 0:
                out.append((u / t, t, u, q))
        return sorted(out, reverse=True)

    flagged = 0
    for block, min_base, cap in (("queries", 0.0, 20), ("first_run", 0.05, 10)):
        rows = ratios(lo[block], hi[block], min_base)
        print(f"\n== {block} (top {cap}; flag > {flag}x) ==")
        for r, t, u, q in rows[:cap]:
            mark = "  <-- FLAG" if r > flag else ""
            print(f"{r:7.1f}x {t:8.3f} -> {u:8.3f}  {q}{mark}")
            flagged += r > flag
        over = [q for r, _, _, q in rows if r > flag]
        print(f"{block}: {len(over)} over {flag}x" + (f": {over}" if over else ""))

    def fam(d):
        out = {}
        for k, v in d.items():
            out[k.split(":")[0]] = out.get(k.split(":")[0], 0.0) + v
        return out

    ml, mh = fam(lo["memo_builds"]), fam(hi["memo_builds"])
    print(f"\n== memo_builds by family (flag > {flag}x) ==")
    for k in sorted(ml):
        if k in mh and ml[k] > 0.02:
            r = mh[k] / ml[k]
            mark = "  <-- FLAG" if r > flag else ""
            print(f"{r:7.1f}x {ml[k]:8.3f} -> {mh[k]:8.3f}  {k}{mark}")
            flagged += r > flag
    print(f"\n{'FLAGGED: ' + str(flagged) if flagged else 'clean: nothing over the flag line'}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
