#!/usr/bin/env python3
"""Segment-normalized comparison of two BENCH_DETAIL.json files.

For every query present in both runs, compute

    raw_ratio  = t_B / t_A
    norm_ratio = raw_ratio / (canary_B(min_at_B) / canary_A(min_at_A))

where canary_X(t) is the canary_series point of run X nearest (in wall
seconds) to the query's min_at in that run — i.e. the query ratio
deflated by how much slower/faster the HOST was in the exact window
segments the two minima were recorded in. This is the arithmetic
PERF.md previously did by hand for cross-round adjudication (r20
verdict item 4).

Usage: tools/normalize.py A.json B.json [--top N]
Prints per-query rows (worst normalized movers first) and the
common-query raw/normalized totals.
"""
import argparse
import json


def load(path):
    d = json.load(open(path))
    series = d.get("canary_series") or []
    anchor = d.get("canary_sec", -1.0)
    return d, series, anchor


def canary_at(series, anchor, t):
    """Nearest series point to wall-second t; fall back to the anchor."""
    if series:
        return min(series, key=lambda p: abs(p[0] - t))[1]
    return anchor if anchor is not None and anchor > 0 else None


def main():
    # argparse (ADVICE r21 low): the old hand-rolled filter only dropped
    # tokens starting with '--', so `--top 5 A.json B.json` parsed '5' as
    # the first input path and crashed
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("a_path")
    ap.add_argument("b_path")
    ap.add_argument("--top", type=int, default=20)
    ns = ap.parse_args()
    top = ns.top
    a_path, b_path = ns.a_path, ns.b_path
    da, sa, ca = load(a_path)
    db, sb, cb = load(b_path)
    qa, qb = da["queries"], db["queries"]
    ma, mb = da.get("min_at", {}), db.get("min_at", {})
    common = sorted(k for k in qa if k in qb
                    and qa[k] and qb[k] and qa[k] > 0 and qb[k] > 0)
    rows = []
    tot_a = tot_b = tot_b_norm = 0.0
    for k in common:
        ta, tb = qa[k], qb[k]
        raw = tb / ta
        c_a = canary_at(sa, ca, ma.get(k, 0.0))
        c_b = canary_at(sb, cb, mb.get(k, 0.0))
        # `is not None` (ADVICE r21 low): a legitimate 0.0 would read as
        # missing under truthiness (and host==0.0 would div/0 below)
        host = (c_b / c_a) if (c_a is not None and c_b is not None
                               and c_a > 0 and c_b > 0) else None
        norm = raw / host if host is not None and host > 0 else None
        rows.append((k, ta, tb, raw, host, norm))
        tot_a += ta
        tot_b += tb
        tot_b_norm += (tb / host) if host is not None and host > 0 else tb
    rows.sort(key=lambda r: -(r[5] if r[5] is not None else r[3]))
    print(f"common queries: {len(common)}")
    print(f"{'query':40s} {'A_s':>7s} {'B_s':>7s} {'raw':>6s} {'host':>6s} {'norm':>6s}")
    for k, ta, tb, raw, host, norm in rows[:top]:
        hs = f"{host:6.2f}" if host is not None else "     -"
        ns = f"{norm:6.2f}" if norm is not None else "     -"
        print(f"{k:40s} {ta:7.2f} {tb:7.2f} {raw:6.2f} {hs} {ns}")
    print(f"\ntotal A = {tot_a:.2f}s  total B = {tot_b:.2f}s  "
          f"raw B/A = {tot_b / tot_a:.3f}  "
          f"norm B/A = {tot_b_norm / tot_a:.3f}")


if __name__ == "__main__":
    main()
