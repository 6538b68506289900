"""Compare two scale_audit JSONs (e.g. sf0.1 vs the 10× replica built by
make_scale_corpus.py) and report, per query, how shuffle volume scaled
relative to input volume — the measured form of the 100 TB claim.

Reading the table: `in×` is input-records growth, `shuf×` shuffle-records
growth. A scalable plan has shuf× ≈ in× (flat shuf/in ratio); shuf×
significantly above in× means the plan does super-linear work and will
not survive the next decade of scale. Wall times are reported but NOT
the metric — they carry host load; the record counts are exact.

Usage: python tools/scale_ratio_report.py scale_audit.json \
           scale_audit_sf1.json > SCALE_RATIOS.md
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    bq, gq = base["queries"], big["queries"]
    common = [q for q in gq if q in bq]
    print(f"# Shuffle-scaling ratios: {base['sf_dir']} -> {big['sf_dir']}\n")
    print("| query | in× | shuf× | shuf/in @base | shuf/in @big | wall× |")
    print("|---|---|---|---|---|---|")

    def ratio(a, b):
        return (b / a) if a else float("inf") if b else 1.0

    rows = []
    for q in common:
        b, g = bq[q], gq[q]
        inx = ratio(b["input_records"], g["input_records"])
        shx = ratio(b["shuffle_write_records"], g["shuffle_write_records"])
        si_b = (b["shuffle_write_records"] / b["input_records"]
                if b["input_records"] else 0.0)
        si_g = (g["shuffle_write_records"] / g["input_records"]
                if g["input_records"] else 0.0)
        wx = ratio(b["wall_sec"], g["wall_sec"])
        rows.append((q, inx, shx, si_b, si_g, wx))
    for q, inx, shx, si_b, si_g, wx in sorted(rows, key=lambda r: -r[2]):
        print(f"| {q} | {inx:.1f} | {shx:.1f} | {si_b:.2f} | {si_g:.2f} "
              f"| {wx:.1f} |")


if __name__ == "__main__":
    main()
