#!/usr/bin/env python3
"""Bench-regression gate (round-15 verdict item 2).

Diffs per-query times between two bench artifacts and flags
regressions, printing the loadavg/env lines next to the verdict so a
loaded host can't masquerade as a plan regression (the round-9/13/14
lesson: compare per-query medians and loadavg lines, not wall totals).

Usage:
    python3 scripts/bench_compare.py OLD.json NEW.json [threshold]

Accepts either artifact shape:
  - a BENCH_r{N}_local.json wrapper: {"lines": ["{...}", ...], ...}
  - a driver BENCH_r{N}.json: {"tail": "...", ...} with embedded lines
  - a raw file of one-JSON-per-line bench stdout

Exit code 1 iff any query regressed by more than `threshold`
(default 1.5x) — the close-out gate; 0 otherwise.
"""
import json
import sys


def extract(path):
    """Return (queries: dict, env: dict|None, total: float|None)."""
    with open(path) as f:
        raw = f.read()
    candidates = []
    try:
        doc = json.loads(raw)
        if isinstance(doc, dict):
            if "lines" in doc:
                candidates = [l for l in doc["lines"] if isinstance(l, str)]
            elif "tail" in doc:
                candidates = doc["tail"].splitlines()
            else:
                candidates = [raw]
    except json.JSONDecodeError:
        candidates = raw.splitlines()
    queries, env, total = None, None, None
    fragments = []
    for line in candidates:
        line = line.strip()
        if not line.startswith("{"):
            idx = line.find('{"metric"')
            if idx < 0:
                # driver "tail" truncates mid-line: keep the fragment for
                # the best-effort pair recovery below
                if '":' in line:
                    fragments.append(line)
                continue
            line = line[idx:]
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            if '":' in line:
                fragments.append(line)
            continue
        if not isinstance(obj, dict):
            continue
        if "queries" in obj and isinstance(obj["queries"], dict):
            queries = obj["queries"]
        if obj.get("metric") == "env":
            env = obj
        if obj.get("metric") == "total":
            total = obj.get("value")
    if queries is None and fragments:
        # best effort: regex out "name":float pairs from the truncated
        # queries blob — PARTIAL data (only the keys the tail retained)
        import re
        skip = {"value", "sf", "metric", "unit", "total", "n", "rc", "cpus"}
        pairs = {}
        for frag in fragments:
            for k, v in re.findall(r'"([a-z][a-z0-9_]+)":([0-9]+\.[0-9]+)', frag):
                if k not in skip:
                    pairs[k] = float(v)
        if pairs:
            print(f"warning: {path} holds a truncated queries blob — "
                  f"recovered {len(pairs)} per-query times (PARTIAL)")
            queries = pairs
    return queries, env, total


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_q, old_env, old_total = extract(old_path)
    new_q, new_env, new_total = extract(new_path)
    if not old_q or not new_q:
        print(f"bench_compare: could not find a queries block in "
              f"{'both files' if not old_q and not new_q else (old_path if not old_q else new_path)}")
        return 2

    for tag, env in (("old", old_env), ("new", new_env)):
        if env:
            print(f"{tag} env: loadavg {env.get('loadavg_start','?')} -> "
                  f"{env.get('loadavg_end','?')}  cpus={env.get('cpus','?')} "
                  f"timing={env.get('timing','?')}")
        else:
            print(f"{tag} env: (no env line — single-shot driver artifact; "
                  f"treat per-query deltas as upper bounds)")
    if old_total is not None and new_total is not None:
        print(f"total: {old_total:.1f}s -> {new_total:.1f}s "
              f"({new_total / old_total:.2f}x)")

    shared = sorted(set(old_q) & set(new_q))
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))
    regress, improve = [], []
    for k in shared:
        o, n = float(old_q[k]), float(new_q[k])
        if o <= 0:
            continue
        r = n / o
        # ignore sub-100ms jitter in either direction
        if r > threshold and n - o > 0.1:
            regress.append((r, k, o, n))
        elif r < 1.0 / threshold and o - n > 0.1:
            improve.append((r, k, o, n))
    regress.sort(reverse=True)
    improve.sort()

    def brief(xs):
        return f"{xs[:10]}{' ...' if len(xs) > 10 else ''}" if xs else ""
    print(f"\n{len(shared)} shared queries; {len(added)} added "
          f"{brief(added)}; {len(removed)} removed {brief(removed)}")
    if regress:
        print(f"\nREGRESSIONS (> {threshold}x and > 0.1s):")
        for r, k, o, n in regress:
            print(f"  {k:40s} {o:7.3f}s -> {n:7.3f}s  ({r:.2f}x)")
    else:
        print(f"\nno regressions > {threshold}x")
    if improve:
        print(f"\nimprovements (< {1/threshold:.2f}x and > 0.1s):")
        for r, k, o, n in improve:
            print(f"  {k:40s} {o:7.3f}s -> {n:7.3f}s  ({r:.2f}x)")
    return 1 if regress else 0


if __name__ == "__main__":
    sys.exit(main())
