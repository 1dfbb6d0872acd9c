#!/usr/bin/env python
"""Quick status of the fresh annotate scaling pool (BENCH/curation_scaling.json).

Prints the cross-phase composite, the per-round variable-part series
tail, and each cell's latest wall vs pooled best, so the operator can
see at a glance whether a quiet-phase round has landed (all four cells
at/near best in ONE round) or whether >=3 consecutive same-phase
rounds clear 0.8.
"""
import json
import pathlib

d = json.loads((pathlib.Path(__file__).resolve().parents[1]
                / "BENCH" / "curation_scaling.json").read_text())
v = d["annotate_variable_x800_x3200@2_8"]
per = v["per_round_efficiency"]
print(f"composite(pooled-best) = {v['efficiency']}  rounds = {len(per)}")
print("per-round tail:", [round(x, 3) for x in per[-8:]])
run = 0
for x in reversed(per):
    if x >= 0.8:
        run += 1
    else:
        break
print(f"consecutive rounds >= 0.8 (from latest): {run}")
raw = d["raw"]
for lvl in ("2", "8"):
    for job in ("annotate@2_8", "annotate_x3200@2_8"):
        arr = raw[lvl][job]
        print(f"local[{lvl}] {job:22s} last={arr[-1]:7.1f}s "
              f"best={min(arr):7.1f}s  (+{100*(arr[-1]/min(arr)-1):.0f}%)")
a, a3 = d["annotate@2_8"], d["annotate_x3200@2_8"]
dl2 = a3["best_local2_s"] - a["best_local2_s"]
dl8 = a3["best_local8_s"] - a["best_local8_s"]
print(f"pooled deltas: l2={dl2:.1f}s l8={dl8:.1f}s "
      f"-> eff {dl2/dl8/4:.3f}  (l8@3200x best needed for 0.8: "
      f"{a['best_local8_s'] + dl2/3.2:.1f}s)")
