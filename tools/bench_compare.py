#!/usr/bin/env python3
"""Compare a fresh solo bench JSON line against historical BENCH_r*.json.

Usage: bench_compare.py <bench_log_or_json> [queries...]

Reads the last {"metric":...} line from the given file, then prints per-
query ratios against BENCH_r01 (the de-facto baseline) for the named
queries (default: the round-11 flagged four), plus the slowest-10 table.
"""
import json
import re
import sys


def load_metric_line(path):
    txt = open(path).read()
    lines = re.findall(r'\{"metric"[^\n]*\}', txt)
    if not lines:
        raise SystemExit(f"no metric line in {path}")
    return json.loads(lines[-1])


def load_round(path):
    b = json.load(open(path))
    p = b.get("parsed")
    if isinstance(p, dict) and p.get("queries"):
        return p
    lines = re.findall(r'\{"metric"[^\n]*\}', b.get("tail", ""))
    return json.loads(lines[-1]) if lines else {}


def main():
    fresh = load_metric_line(sys.argv[1])
    flagged = sys.argv[2:] or [
        "u4_anti_overlap", "u_setops", "u4_noisy_sessions", "t_langid"]
    r01 = load_round("BENCH_r01.json")
    fq = fresh["queries"]
    print(f"fresh: {len(fq)} queries, total {fresh['value']:.1f}s "
          f"({fresh['value']/len(fq):.3f} s/q)")
    print("\n== flagged queries vs r01 ==")
    for q in flagged:
        new = fq.get(q)
        old = r01.get("queries", {}).get(q)
        if new is None or old is None:
            print(f"  {q}: missing (new={new}, r01={old})")
        else:
            print(f"  {q}: {new:.3f}s vs r01 {old:.3f}s -> {new/old:.2f}x"
                  f" {'OK' if new/old <= 2.0 else '>2x WEAK-CANDIDATE'}")
    common = set(fq) & set(r01.get("queries", {}))
    if common:
        tot_new = sum(fq[q] for q in common)
        tot_old = sum(r01["queries"][q] for q in common)
        print(f"\n== r01-common aggregate ({len(common)} q) == "
              f"{tot_new:.1f}s vs {tot_old:.1f}s -> {tot_new/tot_old:.2f}x")
    print("\n== slowest 10 ==")
    for q, s in sorted(fq.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {q}: {s:.2f}s")


if __name__ == "__main__":
    main()
