#!/usr/bin/env python3
"""Fold a bench log's per-query medians into bench_history.json as the r13
row (overwriting the interrupted mid-build round's r13 entries with the
round-final clean measurement), and lower `ref` where the new median beats
it. Usage: update_ledger_r13.py <bench_log> [round_key]"""
import json, re, sys

log = sys.argv[1]
rk = sys.argv[2] if len(sys.argv) > 2 else "r13"
path = "/root/repo/bench_history.json"
led = json.load(open(path))
meds = {}
for m in re.finditer(r'\{"query":"(q[^"]+)","sec_median":([-\d.]+)', open(log).read()):
    v = float(m.group(2))
    if v > 0:
        meds[m.group(1)] = v
n_new = n_ref = 0
for q, v in meds.items():
    row = led.setdefault(q, {})
    row[rk] = v
    n_new += 1
    if "ref" not in row or v < row["ref"]:
        row["ref"] = round(v, 3)
        n_ref += 1
json.dump(led, open(path, "w"), indent=0, sort_keys=True)
print(f"updated {n_new} {rk} rows, lowered {n_ref} refs")
