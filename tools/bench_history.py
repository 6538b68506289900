"""Collect per-round bench results into one machine-readable history
(VERDICT r7 #8): parses every BENCH_r*.json the driver recorded (each is
a wrapper with a `parsed` payload, or a bare payload for local runs),
emits BENCH_HISTORY.json with raw + calibration-normalized per-query
values per round, and prints a markdown trend table. Normalization
divides by that round's `calibration_sec` (the fixed 4B-row codegen
microbenchmark in bench.py) so host-generation drift — measured at
1.3-1.6x across driver rounds — doesn't masquerade as plan change;
rounds before r7 predate the calibration column and report raw-only.

Usage: python tools/bench_history.py [--write]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> dict[int, dict]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            data = json.load(f)
        payload = data.get("parsed", data)
        if not isinstance(payload, dict) or "queries" not in payload:
            continue
        cal = payload.get("calibration_sec")
        rounds[int(m.group(1))] = {
            "value": payload.get("value"),
            "calibration_sec": cal,
            "queries": payload["queries"],
            "queries_normalized": payload.get("queries_normalized")
            or (
                {n: round(s / cal, 4) for n, s in payload["queries"].items()}
                if cal
                else None
            ),
        }
    return rounds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="write BENCH_HISTORY.json next to the artifacts")
    args = ap.parse_args()
    rounds = load_rounds()
    if args.write:
        out = os.path.join(ROOT, "BENCH_HISTORY.json")
        with open(out, "w") as f:
            json.dump(rounds, f, indent=1, sort_keys=True)
        print(f"wrote {out}")
    names = sorted({n for r in rounds.values() for n in r["queries"]})
    cols = sorted(rounds)
    print("| query | " + " | ".join(f"r{c}" for c in cols) + " |")
    print("|---" * (len(cols) + 1) + "|")
    for n in names:
        cells = []
        for c in cols:
            r = rounds[c]
            norm = (r["queries_normalized"] or {}).get(n)
            raw = r["queries"].get(n)
            cells.append(
                f"{norm:.2f}" if norm is not None
                else (f"{raw:.2f}*" if raw is not None else "")
            )
        print(f"| {n} | " + " | ".join(cells) + " |")
    print("\n(normalized secs = raw / calibration_sec; `*` = raw only, "
          "pre-calibration round)")


if __name__ == "__main__":
    main()
