"""Collect serve_bench sweep results from log files into one ranking.

Usage: python tools/sweep_report.py /tmp/sweep_r2h.log [/tmp/sweep_r2i.log ...]
Parses the one-JSON-line-per-variant output of serve_bench --sweep and
prints a fps ranking plus errors."""

import json
import sys


def main(paths):
    rows, errors = [], []
    for p in paths:
        try:
            lines = open(p).read().splitlines()
        except OSError as e:
            print(f"[skip] {p}: {e}")
            continue
        for ln in lines:
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "variant" not in d:
                continue
            (errors if "error" in d else rows).append((p, d))
    rows.sort(key=lambda r: -r[1].get("fps", 0.0))
    print(f"{'variant':24} {'fps':>7} {'ms':>8} {'compile_s':>9}  source")
    for p, d in rows:
        print(f"{d['variant']:24} {d.get('fps', 0):7.2f} "
              f"{d.get('rollout_ms', 0):8.1f} {d.get('compile_s', 0):9.1f}"
              f"  {p}")
    for p, d in errors:
        print(f"ERROR {d['variant']:18} {d['error'][:120]}  {p}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/sweep_r2h.log", "/tmp/sweep_r2i.log"])
