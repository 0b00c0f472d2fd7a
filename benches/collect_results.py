"""Collate a hardware-session output directory (benches/r2_hw_session.sh)
into markdown table rows for RESULTS_r2.md.

Usage: python benches/collect_results.py /tmp/r2hw

Pure host-side log parsing — no jax import, safe to run while the tunnel is
wedged. Prints the bench_all table, the headline line, the config-5 rows,
the interactive-fps rows, and the oracle verdict; missing/failed logs print
as '(absent)' so partial sessions still collate.
"""

from __future__ import annotations

import json
import os
import sys


def _json_lines(path):
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r2hw"

    oracle = os.path.join(d, "oracle.log")
    if os.path.exists(oracle):
        txt = open(oracle).read()
        fails = txt.count("FAIL")
        print(f"## oracle: {'PASS' if fails == 0 and 'OK' in txt else f'{fails} FAIL lines'}")
    else:
        print("## oracle: (absent)")

    print("\n## headline (bench.py)")
    for row in _json_lines(os.path.join(d, "headline.log")):
        print(f"{row.get('value')} Mrays/s (strict {row.get('value_strict')}, "
              f"{row.get('spp_per_s')} spp/s, vs_baseline {row.get('vs_baseline')})")

    print("\n## bench_all table (| config | tris | engine | Mrays/s | strict | spp/s |)")
    for name in ("bench_all", "ab_walkmin", "ab_nosort", "ab_envplain"):
        rows = _json_lines(os.path.join(d, f"{name}.log"))
        if not rows:
            print(f"({name}: absent)")
            continue
        print(f"### {name}")
        for r in rows:
            if "config" not in r:
                continue
            print(f"| {r['config']} | {r.get('tris', '?'):,} | {r.get('engine', '?')} "
                  f"| {r.get('mrays_per_s', '—')} | {r.get('mrays_per_s_strict', '—')} "
                  f"| {r.get('spp_per_s', '—')} |")

    print("\n## config 5 (bench_twolevel)")
    for name in ("twolevel", "twolevel_dragon"):
        for r in _json_lines(os.path.join(d, f"{name}.log")):
            print(f"{name}: {json.dumps(r)}")

    print("\n## interactive fps")
    for r in _json_lines(os.path.join(d, "fps.log")):
        print(json.dumps(r))

    print("\n## walk profile")
    for name in ("profile_walk", "profile_walk_dragon"):
        for r in _json_lines(os.path.join(d, f"{name}.log")):
            print(f"{name}: {json.dumps(r)}")

    print("\n## quality")
    for r in _json_lines(os.path.join(d, "quality.log")):
        print(json.dumps(r))


if __name__ == "__main__":
    main()
