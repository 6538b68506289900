"""Production-knob stress run of the batched BPE trainer (NOTES_r13
handoff follow-through, done in-round): rounds x batch far above the
driver-gated (2, 3) registration, at sf0.1 and optionally the x10
replica, to measure (a) per-round wall as the merge table grows, (b)
whether the chained `_bpe_apply_merge` expression column survives
Catalyst at batch-sized merge chains, and (c) total driver round-trips
vs the sequential trainer's 2-per-merge.

Usage: python tools/profile_batched_bpe.py [--rounds 8] [--batch 64]
       [--sf-dir /root/testdata/sf0.1] [--pretokenizer word]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--pretokenizer", default="word")
    args = ap.parse_args()

    from ehr_data_pipeline_spark.operators.text_analysis import (
        bpe_batched_trainer_rounds,
    )
    from ehr_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="batched-bpe-stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    docs.count()  # warm the scan

    t0 = time.time()
    out = bpe_batched_trainer_rounds(
        docs,
        n_rounds=args.rounds,
        batch_size=args.batch,
        pretokenizer=args.pretokenizer,
    )
    rows = out.orderBy("round", "pos").collect()
    wall = time.time() - t0
    per_round: dict[int, int] = {}
    toks: dict[int, int] = {}
    for r in rows:
        per_round[r["round"]] = per_round.get(r["round"], 0) + 1
        toks[r["round"]] = r["corpus_tokens_after"]
    print(f"\nrounds={args.rounds} batch={args.batch} "
          f"pretokenizer={args.pretokenizer} sf={args.sf_dir}")
    print(f"total merges learned: {len(rows)}  wall: {wall:.1f}s "
          f"({wall / max(args.rounds, 1):.1f}s/round, "
          f"{wall / max(len(rows), 1):.2f}s/merge)")
    for rnd in sorted(per_round):
        print(f"  round {rnd:3d}: {per_round[rnd]:3d} merges kept, "
              f"corpus tokens after = {toks[rnd]}")
    seq_jobs = 2 * len(rows)
    bat_jobs = 2 * len(per_round)
    print(f"driver round-trips: {bat_jobs} (sequential would be "
          f"{seq_jobs} for the same {len(rows)} merges)")
    spark.stop()


if __name__ == "__main__":
    main()
