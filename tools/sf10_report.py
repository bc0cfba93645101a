#!/usr/bin/env python3
"""Assemble bench_sf10_subset.json from the two sf10 profile runs.

The sf10 probe runs the scale-critical families one decade above sf1,
split into two dataset profiles so the store ETL fits the sandbox
disk (see make_sf1.py): `docs` upscales documents/events/embeddings
100x, `facts` upscales customer/supplier/part/orders 100x. Each
query's denominator is the SAME-SESSION sf1 subset run (identical
binary, same machine conditions), so the ratio isolates plan scaling
from environment contention. Expected shape: the probed tables are
10x sf1, so a linear operator on fixed cores lands at <= ~10x, with
sub-second queries far below (fixed overheads amortize).

Usage: sf10_report.py <sf1_json_line_file> <docs_json_line_file>
                      <facts_json_line_file> <out.json>
Each input is the Bench stdout capture (last JSON line is parsed).
"""
import json, sys

def load(path):
    line = [l for l in open(path) if l.lstrip().startswith('{"metric"')][-1]
    return json.loads(line)

sf1, docs, facts = (load(p) for p in sys.argv[1:4])
sf1q = {("q_" + k if not k.startswith("q_") else k): v
        for k, v in sf1["queries"].items()}

out = {"metric": "sf10_subset", "unit": "sec",
       "note": ("two-profile probe: each query's tables at 100x sf0.1 "
                "(=10x sf1), remainder at 10x; denominator = same-session "
                "sf1 run of the identical subset"),
       "etl": {"docs": docs.get("etl"), "facts": facts.get("etl"),
               "sf1": sf1.get("etl")},
       "queries": {}, "flags": []}
for profile, run in (("docs", docs), ("facts", facts)):
    errs = run.get("errors", {})
    for k, v in run["queries"].items():
        name = "q_" + k if not k.startswith("q_") else k
        base = sf1q.get(name)
        ratio = round(v / base, 2) if base and base > 0 else None
        entry = {"profile": profile, "sf10": v, "sf1": base, "ratio": ratio}
        if k in errs or name in errs:
            # time-to-failure, not a measurement — keep the error text
            entry["err"] = errs.get(k, errs.get(name))
            entry["ratio"] = None
        # a query measured in BOTH profiles must not silently clobber
        # the first measurement (totals and the superlinear scan would
        # miss it) — keep both, keyed by profile
        if name in out["queries"]:
            name = f"{name}@{profile}"
        out["queries"][name] = entry
        # superlinear flag: >10x for 10x data AND slow enough to matter
        if entry["ratio"] is not None and entry["ratio"] > 10 and v > 3.0:
            out["flags"].append({"query": name, "sf1": base, "sf10": v,
                                 "ratio": entry["ratio"]})
# headline totals cover MEASURED queries only: an errored query's sf10
# value is a time-to-failure, not a measurement, so mixing it into
# total_sf10 while its sf1 baseline lands in total_sf1_subset would
# compare failure semantics against measurement semantics. Errored
# entries get their own bucket.
ok = [q for q in out["queries"].values() if "err" not in q]
failed = [q for q in out["queries"].values() if "err" in q]
out["total_sf10"] = round(sum(q["sf10"] for q in ok), 2)
out["total_sf1_subset"] = round(sum(q["sf1"] for q in ok if q["sf1"]), 2)
if failed:
    out["failed"] = {"n": len(failed),
                     "time_to_failure": round(sum(q["sf10"] for q in failed), 2),
                     "sf1_of_failed": round(
                         sum(q["sf1"] for q in failed if q["sf1"]), 2)}
json.dump(out, open(sys.argv[4], "w"), indent=1)
print(f"wrote {sys.argv[4]}: {len(out['queries'])} queries "
      f"({len(failed)} errored, excluded from totals), "
      f"{len(out['flags'])} superlinear flags, "
      f"total {out['total_sf10']}s vs sf1 {out['total_sf1_subset']}s")
for f in out["flags"]:
    print("FLAG", f)
