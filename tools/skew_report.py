#!/usr/bin/env python3
"""Merge the uniform-vs-skewed sf1 bench runs into bench_skew.json.

Inputs are two Bench stdout captures (SPARK_GRAFT_ONLY subset runs at
the same factor and row counts): the /tmp/sf1 uniform twin and the
/tmp/sf1skew Zipf twin from tools/make_skew.py. Output: per-query
{uniform, skew, ratio} plus flags for ratio > 3 (the round-15 fix
threshold) and the two ETL times (the store build itself contains the
current-flag window over the hot /user path, so its ratio is evidence
too).

AUTO-ADJUDICATION (round-17): pass `--uniform-dir` and `--skew-dir`
(the runs' SPARK_GRAFT_SF_DIR values) and every would-be flag row is
re-measured SOLO in a fresh JVM on both twins before the artifact is
written (tools/remeasure.py — the manual discipline that cleared
merge_delete 2.49x, sessionize 11.95x and merge_pruned 3.47x as
contention in rounds 15-16, now performed by the tool). Both numbers
are stamped; a flag whose isolated ratio clears the threshold moves to
`adjudicated` with the contention verdict, one that survives isolation
stays a flag — now with fresh-JVM evidence attached.

Usage: skew_report.py <uniform.out> <skew.out> <out.json>
         [--uniform-dir D] [--skew-dir D] [--env K=V ...] [note...]
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
udir = sdir = None
env = []
note = []
pos = []
i = 0
while i < len(args):
    a = args[i]
    if a == "--uniform-dir":
        udir = args[i + 1]; i += 2
    elif a == "--skew-dir":
        sdir = args[i + 1]; i += 2
    elif a == "--env":
        env.append(args[i + 1]); i += 2
    elif len(pos) < 3:
        pos.append(a); i += 1
    else:
        note.append(a); i += 1

uni, skw = load(pos[0]), load(pos[1])
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

flags, adjudicated = [], []
for n, q in out["queries"].items():
    is_err = "err_uniform" in q or "err_skew" in q
    is_hot = (q["ratio"] is not None and q["ratio"] > 3.0
              and q["skew"] > 1.0)
    if not (is_err or is_hot):
        continue
    if is_hot and not is_err and udir and sdir:
        ru = remeasure(n, udir, env)
        rs = remeasure(n, sdir, env)
        if ru is not None and rs is not None and ru > 0:
            q["uniform_remeasured"] = ru
            q["skew_remeasured"] = rs
            q["ratio_remeasured"] = round(rs / ru, 2)
            q["remeasured"] = "fresh-JVM solo run on both twins " \
                              "(tools/remeasure.py, auto)"
            if q["ratio_remeasured"] <= 3.0:
                adjudicated.append({
                    "query": n, **q,
                    "verdict": "in-sweep contention: isolated "
                               f"ratio {q['ratio_remeasured']} vs "
                               f"in-sweep {q['ratio']}"})
                continue
    flags.append({"query": n, **q})
out["flags"] = flags
if adjudicated:
    out["adjudicated"] = adjudicated
ok = {n: q for n, q in out["queries"].items()
      if q["ratio"] is not None}
out["total_uniform"] = round(sum(q["uniform"] for q in ok.values()), 2)
out["total_skew"] = round(sum(q["skew"] for q in ok.values()), 2)
if note:
    out["note"] = " ".join(note)
json.dump(out, open(pos[2], "w"), indent=1)
print(f"wrote {pos[2]}: {len(out['queries'])} queries, "
      f"{len(out['flags'])} flags, {len(adjudicated)} auto-adjudicated, "
      f"uniform {out['total_uniform']}s vs skew {out['total_skew']}s")
for f in out["flags"]:
    print("FLAG", f)
for f in adjudicated:
    print("ADJUDICATED", f["query"], f["verdict"])
