#!/usr/bin/env python3
"""Three-decade scale trend for one pillar: merge three Bench subset
runs at factor 10/100/1000 of a common base into per-decade ratios.

Usage: decades_report.py <label> <f10.out> <f100.out> <f1000.out> <out.json> [note...]

Per query: t10, t100, t1000, ratio_d1 = t100/t10, ratio_d2 = t1000/t100.
A scale-linear operator holds both ratios near 10; a superlinear plan
shows up as a ratio far above 10 in the second decade. ETL times ride
along (the store build is itself a measured operator).
"""
import json
import sys


def load(path):
    lines = [l for l in open(path, errors="replace")
             if l.lstrip().startswith('{"metric"')]
    if not lines:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(lines[-1])


label = sys.argv[1]
runs = [load(p) for p in sys.argv[2:5]]
out = {"pillar": label,
       "etl": {"f10": runs[0].get("etl"), "f100": runs[1].get("etl"),
               "f1000": runs[2].get("etl")},
       "queries": {}}
e = out["etl"]
if all(e[k] for k in ("f10", "f100", "f1000")):
    e["ratio_d1"] = round(e["f100"] / e["f10"], 2)
    e["ratio_d2"] = round(e["f1000"] / e["f100"], 2)
for name in sorted(runs[0]["queries"]):
    t = [r["queries"].get(name) for r in runs]
    entry = {"f10": t[0], "f100": t[1], "f1000": t[2]}
    if t[0] and t[1]:
        entry["ratio_d1"] = round(t[1] / t[0], 2)
    if t[1] and t[2]:
        entry["ratio_d2"] = round(t[2] / t[1], 2)
    for i, r in enumerate(runs):
        if name in r.get("errors", {}):
            entry[f"err_f{10**(i+1)}"] = r["errors"][name]
    out["queries"][name] = entry
out["flags"] = [
    {"query": n, **q} for n, q in out["queries"].items()
    if any(k.startswith("err") for k in q)
    or (q.get("ratio_d2") or 0) > 20 and (q.get("f1000") or 0) > 3.0]
if len(sys.argv) > 6:
    out["note"] = " ".join(sys.argv[6:])
json.dump(out, open(sys.argv[5], "w"), indent=1)
print(f"wrote {sys.argv[5]}: {len(out['queries'])} queries, "
      f"{len(out['flags'])} flags")
for f in out["flags"]:
    print("FLAG", f)
