"""Collate a hardware-session output directory (benches/r2_hw_session.sh)
into markdown table rows for RESULTS_r2.md.

Usage: python benches/collect_results.py /tmp/r2hw

Pure host-side log parsing — no jax import, safe to run while the tunnel is
wedged. Directory-driven: EVERY ``<name>.log`` in the session dir is
collated (the A/B row set grows; a hardcoded list silently drops rows) —
oracle logs report their verdict, bench-style JSON lines print as table
rows, everything else prints raw. Missing/empty logs print as '(absent)'
so partial sessions still collate.
"""

from __future__ import annotations

import json
import os
import sys


def _json_lines(path):
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
    logs = sorted(f for f in os.listdir(d) if f.endswith(".log"))
    if not logs:
        print(f"(no .log files in {d})")
        return

    for fname in logs:
        name = fname[:-4]
        path = os.path.join(d, fname)
        rows = _json_lines(path)
        print(f"\n## {name}")
        if name.startswith("oracle"):
            txt = open(path).read()
            fails = txt.count("FAIL")
            verdict = "PASS" if fails == 0 and "OK" in txt else f"{fails} FAIL lines"
            print(verdict)
            for line in txt.splitlines():
                if "->" in line:
                    print(f"  {line.strip()}")
            continue
        if not rows:
            print("(absent or no JSON lines)")
            continue
        for r in rows:
            if "config" in r:  # bench_all / bench_twolevel style
                print(f"| {r['config']} | {r.get('tris', r.get('instances', '?'))} "
                      f"| {r.get('engine', '?')} | {r.get('mrays_per_s', '—')} "
                      f"| {r.get('mrays_per_s_strict', '—')} "
                      f"| {r.get('spp_per_s', '—')} |")
            elif "value" in r and "metric" in r:  # bench.py headline
                print(f"{r['value']} {r.get('unit', '')} (strict "
                      f"{r.get('value_strict')}, {r.get('spp_per_s')} spp/s, "
                      f"vs_baseline {r.get('vs_baseline')})")
            else:
                print(json.dumps(r))


if __name__ == "__main__":
    main()
