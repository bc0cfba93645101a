#!/usr/bin/env python3
"""Merge the uniform-vs-skewed sf1 bench runs into bench_skew.json.

Inputs are two Bench stdout captures (SPARK_GRAFT_ONLY subset runs at
the same factor and row counts): the /tmp/sf1 uniform twin and the
/tmp/sf1skew Zipf twin from tools/make_skew.py. Output: per-query
{uniform, skew, ratio} plus flags for ratio > 3 (the round-15 fix
threshold) and the two ETL times (the store build itself contains the
current-flag window over the hot /user path, so its ratio is evidence
too).

Usage: skew_report.py <uniform.out> <skew.out> <out.json> [note...]
"""
import json
import sys


def load(path):
    lines = [l for l in open(path, errors="replace")
             if l.lstrip().startswith('{"metric"')]
    if not lines:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(lines[-1])


uni, skw = load(sys.argv[1]), load(sys.argv[2])
out = {
    "generator": "tools/make_skew.py (hot customer 30% of orders, hot "
                 "supplier 20% of lineitem, hot user 20% of events, hot "
                 "13-token phrase in 10% of documents) vs make_sf1.py "
                 "uniform at factor 10 — identical row counts",
    "etl": {"uniform": uni.get("etl"), "skew": skw.get("etl"),
            "ratio": round(skw["etl"] / uni["etl"], 2)
            if uni.get("etl") else None},
    "queries": {},
}
for name, u in sorted(uni["queries"].items()):
    s = skw["queries"].get(name)
    entry = {"uniform": u, "skew": s,
             "ratio": round(s / u, 2) if s and u and u > 0 else None}
    if name in uni.get("errors", {}):
        entry["err_uniform"] = uni["errors"][name]
    if s is not None and name in skw.get("errors", {}):
        entry["err_skew"] = skw["errors"][name]
    out["queries"][name] = entry
out["flags"] = [
    {"query": n, **q} for n, q in out["queries"].items()
    if "err_uniform" in q or "err_skew" in q or
    (q["ratio"] is not None and q["ratio"] > 3.0 and q["skew"] > 1.0)]
ok = {n: q for n, q in out["queries"].items()
      if q["ratio"] is not None}
out["total_uniform"] = round(sum(q["uniform"] for q in ok.values()), 2)
out["total_skew"] = round(sum(q["skew"] for q in ok.values()), 2)
if len(sys.argv) > 4:
    out["note"] = " ".join(sys.argv[4:])
json.dump(out, open(sys.argv[3], "w"), indent=1)
print(f"wrote {sys.argv[3]}: {len(out['queries'])} queries, "
      f"{len(out['flags'])} flags, uniform {out['total_uniform']}s "
      f"vs skew {out['total_skew']}s")
for f in out["flags"]:
    print("FLAG", f)
