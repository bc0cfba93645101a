#!/usr/bin/env python3
"""Extend bench_sf10_subset.json with a new probe session.

The r13 probe measured 59 scale-critical queries; later rounds add
operators (containment join, fuzzy decontamination, embedding family
after the sign-pattern synthesis fix, admin/stream surfaces, bulk
merge) that need their own sf10 rows. Each EXTENSION session carries
its own same-session sf1 denominator run, so every (sf1, sf10) pair in
the merged artifact is same-session — pairs from different sessions
coexist (the ratio is what matters, and it is contention-cancelled per
pair).

Usage: sf10_extend.py <existing.json> <sf1_out> <docs_out> <facts_out>
                      <out.json>
Bench outputs may omit a profile (pass "-" to skip). New entries
override existing ones of the same name (a re-measured query replaces
its old row — e.g. q_merge_bulk's green row supersedes nothing, while
a re-run family refreshes in place). Totals/flags recomputed with the
errored-bucket semantics of sf10_report.py.
"""
import json, sys

def load(path):
    if path == "-":
        return None
    line = [l for l in open(path) if l.lstrip().startswith('{"metric"')][-1]
    return json.loads(line)

existing = json.load(open(sys.argv[1]))
sf1, docs, facts = (load(p) for p in sys.argv[2:5])
sf1q = {("q_" + k if not k.startswith("q_") else k): v
        for k, v in sf1["queries"].items()} if sf1 else {}

out = dict(existing)
out.setdefault("queries", {})
out.setdefault("etl", {})
# per-session ETL key: repeated extensions must not overwrite an
# earlier session's provenance under a fixed "_ext" suffix
_n = 1
while any(k.endswith(f"_ext{_n}") for k in out["etl"]):
    _n += 1
for profile, run in (("docs", docs), ("facts", facts)):
    if run is None:
        continue
    out["etl"][f"{profile}_ext{_n}"] = run.get("etl")
    errs = run.get("errors", {})
    for k, v in run["queries"].items():
        name = "q_" + k if not k.startswith("q_") else k
        base = sf1q.get(name)
        ratio = round(v / base, 2) if base and base > 0 else None
        entry = {"profile": profile, "sf10": v, "sf1": base, "ratio": ratio,
                 "session": "ext"}
        if k in errs or name in errs:
            entry["err"] = errs.get(k, errs.get(name))
            entry["ratio"] = None
        out["queries"][name] = entry
if sf1:
    out["etl"][f"sf1_ext{_n}"] = sf1.get("etl")

out["flags"] = [
    {"query": n, "sf1": q["sf1"], "sf10": q["sf10"], "ratio": q["ratio"]}
    for n, q in out["queries"].items()
    if q.get("ratio") is not None and q["ratio"] > 10 and q["sf10"] > 3.0]
ok = [q for q in out["queries"].values() if "err" not in q]
failed = [q for q in out["queries"].values() if "err" in q]
out["total_sf10"] = round(sum(q["sf10"] for q in ok), 2)
out["total_sf1_subset"] = round(sum(q["sf1"] for q in ok if q["sf1"]), 2)
if failed:
    out["failed"] = {"n": len(failed),
                     "time_to_failure": round(sum(q["sf10"] for q in failed), 2),
                     "sf1_of_failed": round(
                         sum(q["sf1"] for q in failed if q["sf1"]), 2)}
else:
    out.pop("failed", None)
_suffix = (" | extended: later-round operators measured in their own "
           "session with a same-session sf1 denominator (entries "
           "tagged session=ext)")
# idempotent: re-running an extension must not duplicate the note
out["note"] = existing.get("note", "")
if _suffix not in out["note"]:
    out["note"] += _suffix
json.dump(out, open(sys.argv[5], "w"), indent=1)
new = [n for n, q in out["queries"].items() if q.get("session") == "ext"]
print(f"wrote {sys.argv[5]}: {len(out['queries'])} queries "
      f"({len(new)} from this extension), {len(out['flags'])} flags, "
      f"total {out['total_sf10']}s vs sf1 {out['total_sf1_subset']}s")
for f in out["flags"]:
    print("FLAG", f)
