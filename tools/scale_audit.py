"""Per-query scale audit: run every registry query at $SPARK_GRAFT_SF_DIR
(default sf0.1) and record, for each, the MEASURED cost facts a 100 TB
reviewer needs — shuffle records/bytes written, input bytes, task count,
wall seconds — plus the static plan flags the plan tests assert
(cartesian-free, broadcasts, top-k via TakeOrderedAndProject, no
unpartitioned row-scale windows).

This makes the repo's 100 TB argument auditable query-by-query without
reading 120 plans: shuffle volume is the thing that scales with data, so
a query whose shuffle-records ≈ its input rows does one honest pass; one
whose shuffle explodes past its input needs (and gets, in its docstring)
an explanation; one with zero shuffle is embarrassingly parallel.

Runtime metrics come from Spark's public monitoring REST API
(/api/v1/applications/{app}/stages — the same numbers the UI shows),
attributed to queries via per-query job groups. Writes SCALE_AUDIT.md
(markdown table + flagged anti-patterns) and scale_audit.json.

Usage:  python tools/scale_audit.py [--sf-dir DIR] [--out PREFIX]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLAN_FLAGS = {
    "cartesian": "CartesianProduct",
    "bnl_join": "BroadcastNestedLoopJoin",
    "broadcast": "BroadcastExchange",
    "topk": "TakeOrderedAndProject",
    "arrow_py": "MapInPandas",
}


def _rest(app_url: str, path: str):
    with urllib.request.urlopen(f"{app_url}/{path}", timeout=10) as r:
        return json.load(r)


def _stage_metrics(app_url: str, stage_ids: set[int]) -> dict[str, int]:
    tot = {"shuffle_write_records": 0, "shuffle_write_bytes": 0,
           "input_bytes": 0, "input_records": 0, "n_tasks": 0}
    for s in _rest(app_url, "stages"):
        if s["stageId"] in stage_ids and s["status"] in ("COMPLETE", "ACTIVE"):
            tot["shuffle_write_records"] += s.get("shuffleWriteRecords", 0)
            tot["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
            tot["input_bytes"] += s.get("inputBytes", 0)
            tot["input_records"] += s.get("inputRecords", 0)
            tot["n_tasks"] += s.get("numCompleteTasks", 0)
    return tot


def _depth(line: str) -> int:
    """Tree depth of a plan line — the column where the operator name
    starts, i.e. after the tree-art prefix (spaces, ':', '+', '-')."""
    return len(line) - len(line.lstrip(" :+-*("))


def _subtree(lines: list[str], i: int) -> list[str]:
    """The plan lines strictly below node ``i`` in its subtree (every
    following line until depth returns to <= node i's depth) — keyed on
    tree structure, not a fixed line window."""
    d = _depth(lines[i])
    out = []
    for ln in lines[i + 1:]:
        if ln.strip() and _depth(ln) <= d:
            break
        out.append(ln)
    return out


# An Aggregate line is a PROVABLE bound only when it is global (one
# output row: keys=[]) or grouped on the two-phase prefix-sum's __bucket
# id (<= n_buckets rows by construction, packing.py/sampling.py). Any
# other grouped aggregate can emit corpus-scale group counts and is NOT
# accepted — the round-6 audit accepted any Aggregate within 4 lines,
# which let a global window over a high-cardinality aggregate pass.
_BOUNDED_AGG = re.compile(r"Aggregate(?:\(\d+\))?\s*\(?keys=\[(|__bucket#[^\],]*)\]")


def _bounded_chain(sub: list[str]) -> bool:
    """True when the unary operator chain at the head of ``sub`` reaches
    a provably-bounded frame (top-k / limit / global or __bucket
    aggregate / literal local relation) BEFORE any row-multiplying node
    (join / generate / union) — a Limit below a join does not bound the
    join's output, so scanning stops there."""
    for ln in sub:
        if re.search(r"Join|Generate|Union|CartesianProduct", ln):
            return False
        if re.search(r"TakeOrderedAndProject|Limit|LocalTableScan|^\s*\W*Range ", ln):
            return True
        if _BOUNDED_AGG.search(ln):
            return True
    return False


def _unpartitioned_window_over_unbounded(plan: str) -> bool:
    """True when some Window has an empty PARTITION BY and its child
    subtree is NOT a provably bounded frame (the global-sort-of-the-
    corpus anti-pattern). Bounds accepted: top-k/limit, a literal local
    relation, a GLOBAL aggregate, or the prefix-sum ``__bucket`` totals
    aggregate — see :data:`_BOUNDED_AGG` for why grouped aggregates in
    general are not bounds."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        m = re.search(r"Window \[.*windowspecdefinition\(([^)]*)\)", ln)
        if not m:
            continue
        # partition spec present => partitioned window, fine
        spec = m.group(1)
        # windowspecdefinition(partcols..., ordercol ASC..., frame...):
        # an unpartitioned spec starts with the order column directly —
        # heuristically: no element before the first ASC/DESC token
        first = spec.split(",")[0]
        if " ASC" in first or " DESC" in first:
            if not _bounded_chain(_subtree(lines, i)):
                return True
    return False


def _bnlj_over_unbounded(plan: str) -> bool:
    """True when a BroadcastNestedLoopJoin's BUILD side is not visibly
    bounded — the O(N²)-work / N-scaling-broadcast anti-pattern the
    pre-round-7 emb_cosine_neardup_pairs shipped (unbounded all-pairs
    self-join). Bounds accepted on the broadcast subtree: a pushed or
    residual range filter on an id (the fixed-slice precedent), a
    limit/top-k, a literal local relation, or ANY aggregate (the
    one-row split points, distinct-group dimensions and centroid tables
    the legitimate broadcast joins carry — grouped aggregates are
    accepted here, unlike the window bound, because a broadcast of a
    grouped aggregate already has a hard 8 GB ceiling and the driver
    OOMs loudly, whereas an unpartitioned window dies slowly)."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        sub = _subtree(lines, i)
        if not sub:
            return True  # format drift: flag for a human
        # the join's DIRECT children sit at the minimum depth of its
        # subtree; the build side is the direct child that IS the
        # broadcast (a BroadcastExchange / broadcast query stage /
        # reused broadcast). Searching the whole subtree instead would
        # match broadcasts belonging to hash joins inside the PROBE
        # side and mis-audit their build inputs.
        child_depth = min(_depth(s) for s in sub if s.strip())
        child_idx = [j for j, s in enumerate(sub) if _depth(s) == child_depth]
        build = None
        for j in child_idx:
            if re.search(r"BroadcastExchange|BroadcastQueryStage|ReusedExchange", sub[j]):
                build = [sub[j]] + _subtree(sub, j)
                break
        if build is None:
            # no broadcast child found (plan-format drift): flag it —
            # better a false positive a human inspects than a silent pass
            return True
        txt = "\n".join(build)
        # selectivity bounds are accepted only in their PUSHED form
        # (LessThan/EqualTo/... inside a scan's PushedFilters) — a
        # residual `= N` text match would also fire on row-shape guards
        # like `size(embedding) = 64`, which bound NOTHING about
        # cardinality (the valid-vector contract filter taught us this:
        # it made the unbounded all-pairs canary pass silently)
        bounded = bool(
            re.search(r"TakeOrderedAndProject|Limit|LocalTableScan|ExistingRDD", txt)
            or re.search(r"Aggregate", txt)
            or re.search(r"(?:LessThan|GreaterThan)(?:OrEqual)?\(|EqualTo\(", txt)
            or re.search(r"ReusedExchange", txt)
        )
        if not bounded:
            return True
    return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="SCALE_AUDIT")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: whole registry)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ehr_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-audit", extra_conf={
        "spark.ui.enabled": "true", "spark.ui.port": "4049"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    app_id = sc.applicationId
    app_url = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1/applications/{app_id}" \
        if sc.uiWebUrl else f"http://localhost:4049/api/v1/applications/{app_id}"

    from ehr_data_pipeline_spark.queries import REGISTRY

    names = (args.queries.split(",") if args.queries else list(REGISTRY))
    tracker = sc.statusTracker()
    results = {}
    for name in names:
        spec = REGISTRY[name]
        group = f"audit:{name}"
        sc.setJobGroup(group, name)
        # time from BUILD, not just collect: pair/group builders run
        # materialization jobs at call time (_materialize_candidates),
        # which previously landed in the shuffle columns (job-group
        # attribution) but NOT in wall — group-emission surfaces showed
        # sub-second walls over multi-GB shuffles. Wall now covers the
        # same work the record counts do.
        t0 = time.perf_counter()
        df = spec.fn(spark, args.sf_dir)
        plan_pre = df._jdf.queryExecution().executedPlan().toString()
        n_rows = len(df.collect())
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        job_ids = tracker.getJobIdsForGroup(group) or []
        stage_ids: set[int] = set()
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji:
                stage_ids.update(ji.stageIds)
        met = _stage_metrics(app_url, stage_ids)
        results[name] = {
            "wall_sec": round(wall, 3),
            "out_rows": n_rows,
            **met,
            "flags": {k: v in plan_pre for k, v in PLAN_FLAGS.items()},
            "unpartitioned_unbounded_window":
                _unpartitioned_window_over_unbounded(plan_pre),
            "bnlj_unbounded_build": _bnlj_over_unbounded(plan_pre),
        }
        print(f"{name}: {wall:.2f}s shuffleRec={met['shuffle_write_records']} "
              f"inRec={met['input_records']}", flush=True)

    with open(f"{args.out.lower()}.json", "w") as f:
        json.dump({"sf_dir": args.sf_dir, "queries": results}, f, indent=1)

    # markdown: sorted by shuffle volume, anti-patterns flagged
    lines = [
        "# Scale audit — measured per-query cost facts",
        "",
        f"Generated by `tools/scale_audit.py` at `{args.sf_dir}` "
        f"(local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]). Shuffle "
        "records/bytes are the Spark monitoring API's per-stage totals for "
        "each query's own jobs — the quantity that scales with data. "
        "Reading order for a 100 TB review: a query whose shuffle-records "
        "≤ its input-records does at most one honest pass over its data; "
        "`shuf/in` ≫ 1 means fan-out (explode/self-join) and needs the "
        "docstring's justification; 0 means embarrassingly parallel or "
        "driver-sized.",
        "",
        "| query | wall s | out rows | input rec | shuffle rec | shuf/in "
        "| shuffle MB | tasks | bcast | topk | arrow |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    order = sorted(results, key=lambda n: -results[n]["shuffle_write_records"])
    for name in order:
        r = results[name]
        ratio = (r["shuffle_write_records"] / r["input_records"]
                 if r["input_records"] else 0.0)
        fl = r["flags"]
        lines.append(
            f"| {name} | {r['wall_sec']:.2f} | {r['out_rows']} "
            f"| {r['input_records']} | {r['shuffle_write_records']} "
            f"| {ratio:.2f} | {r['shuffle_write_bytes'] / 1e6:.1f} "
            f"| {r['n_tasks']} | {'y' if fl['broadcast'] else ''} "
            f"| {'y' if fl['topk'] else ''} "
            f"| {'y' if fl['arrow_py'] else ''} |"
        )
    bad = [n for n, r in results.items()
           if r["flags"]["cartesian"] or r["unpartitioned_unbounded_window"]
           or r["bnlj_unbounded_build"]]
    lines += ["", "## Flagged anti-patterns", ""]
    if bad:
        lines += [f"- **{n}**: "
                  + ("CartesianProduct; " if results[n]["flags"]["cartesian"] else "")
                  + ("unpartitioned window over unbounded input; "
                     if results[n]["unpartitioned_unbounded_window"] else "")
                  + ("BroadcastNestedLoopJoin over unbounded build side"
                     if results[n]["bnlj_unbounded_build"] else "")
                  for n in bad]
    else:
        lines.append("None: no CartesianProduct anywhere; every "
                     "unpartitioned Window sits above a bounded top-k/"
                     "limit or driver-sized aggregate frame; every "
                     "BroadcastNestedLoopJoin build side is visibly "
                     "bounded.")
    with open(f"{args.out}.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}.md + {args.out.lower()}.json")
    spark.stop()


if __name__ == "__main__":
    main()
