#!/usr/bin/env python3
"""Three-decade scale trend for one pillar: merge three Bench subset
runs at factor 10/100/1000 of a common base into per-decade ratios.

Usage: decades_report.py <label> <f10.out> <f100.out> <f1000.out> <out.json>
         [--dirs d10,d100,d1000] [--env K=V ...] [note...]

Per query: t10, t100, t1000, ratio_d1 = t100/t10, ratio_d2 = t1000/t100.
A scale-linear operator holds both ratios near 10; a superlinear plan
shows up as a ratio far above 10 in the second decade. ETL times ride
along (the store build is itself a measured operator).

AUTO-ADJUDICATION (round-17): with `--dirs`, any query whose in-sweep
decade ratio exceeds the suspicion threshold (> 11x, i.e. above an honestly linear 10x, with a non-trivial
numerator — r16's sessionize showed 11.95x in-sweep vs 4.3x isolated)
is re-measured SOLO in a fresh JVM on the two decades of the bad ratio
before the artifact is written (tools/remeasure.py). Both numbers are
stamped; a cleared ratio moves the row to `adjudicated`, a surviving
one stays flagged with fresh-JVM evidence attached.
"""
import json
import sys

from remeasure import remeasure


def load(path):
    lines = [l for l in open(path, errors="replace")
             if l.lstrip().startswith('{"metric"')]
    if not lines:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(lines[-1])


args = sys.argv[1:]
dirs = None
env = []
note = []
pos = []
i = 0
while i < len(args):
    a = args[i]
    if a == "--dirs":
        dirs = args[i + 1].split(","); i += 2
    elif a == "--env":
        env.append(args[i + 1]); i += 2
    elif len(pos) < 5:
        pos.append(a); i += 1
    else:
        note.append(a); i += 1

label = pos[0]
runs = [load(p) for p in pos[1:4]]
out = {"pillar": label,
       "etl": {"f10": runs[0].get("etl"), "f100": runs[1].get("etl"),
               "f1000": runs[2].get("etl")},
       "queries": {}}
e = out["etl"]
if all(e[k] for k in ("f10", "f100", "f1000")):
    e["ratio_d1"] = round(e["f100"] / e["f10"], 2)
    e["ratio_d2"] = round(e["f1000"] / e["f100"], 2)
SUSPECT = 11.0  # a LINEAR operator at compute-dominated sizes shows an
# honest 10x per decade (r17 multimodal: video_frames 10.0, audio_spectra
# 9.2) - suspicion starts ABOVE linear; r16 sessionize (11.95 in-sweep,
# 4.3 isolated) stays caught
for name in sorted(runs[0]["queries"]):
    t = [r["queries"].get(name) for r in runs]
    entry = {"f10": t[0], "f100": t[1], "f1000": t[2]}
    if t[0] and t[1]:
        entry["ratio_d1"] = round(t[1] / t[0], 2)
    if t[1] and t[2]:
        entry["ratio_d2"] = round(t[2] / t[1], 2)
    for j, r in enumerate(runs):
        if name in r.get("errors", {}):
            entry[f"err_f{10**(j+1)}"] = r["errors"][name]
    out["queries"][name] = entry

adjudicated = []
if dirs and len(dirs) == 3:
    for name, q in out["queries"].items():
        if any(k.startswith("err") for k in q):
            continue
        for rk, lo, hi in (("ratio_d1", 0, 1), ("ratio_d2", 1, 2)):
            r = q.get(rk)
            if r is None or r <= SUSPECT or (q[f"f{10**(hi+1)}"] or 0) <= 1.0:
                continue
            a = remeasure(name, dirs[lo], env)
            b = remeasure(name, dirs[hi], env)
            if a is None or b is None or a <= 0:
                continue
            q[f"f{10**(lo+1)}_remeasured"] = a
            q[f"f{10**(hi+1)}_remeasured"] = b
            q[f"{rk}_remeasured"] = round(b / a, 2)
            q["remeasured"] = "fresh-JVM solo runs on both decades " \
                              "(tools/remeasure.py, auto)"
            if q[f"{rk}_remeasured"] <= SUSPECT:
                adjudicated.append({
                    "query": name, "ratio_key": rk, **q,
                    "verdict": "in-sweep contention: isolated "
                               f"{rk} {q[f'{rk}_remeasured']} vs "
                               f"in-sweep {r}"})

out["flags"] = [
    {"query": n, **q} for n, q in out["queries"].items()
    if any(k.startswith("err") for k in q)
    or ((q.get("ratio_d2_remeasured", q.get("ratio_d2")) or 0) > 20
        and (q.get("f1000") or 0) > 3.0)]
if adjudicated:
    out["adjudicated"] = adjudicated
if note:
    out["note"] = " ".join(note)
json.dump(out, open(pos[4], "w"), indent=1)
print(f"wrote {pos[4]}: {len(out['queries'])} queries, "
      f"{len(out['flags'])} flags, {len(adjudicated)} auto-adjudicated")
for f in out["flags"]:
    print("FLAG", f)
for f in adjudicated:
    print("ADJUDICATED", f["query"], f["verdict"])
