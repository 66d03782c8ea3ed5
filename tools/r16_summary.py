#!/usr/bin/env python3
"""Round-16 before/after summary: same-window r15-tree vs final-tree
noop benches (the honest comparison under whatever host state the end
of the round has), plus the clean-window round-start reference."""
import json, math, sys

start = json.load(open("plans/r16/bench_start_noop.json"))
final = json.load(open("plans/r16/bench_final_noop.json"))
r15sw = json.load(open("plans/r16/bench_r15tree_samewindow_noop.json"))

def canary(d): return d["canary"]

print("round-start (r15 tree, clean window): total %.1f canary %s" % (start["value"], canary(start)))
print("r15 tree, END window:                 total %.1f canary %s" % (r15sw["value"], canary(r15sw)))
print("final tree, END window:               total %.1f canary %s" % (final["value"], canary(final)))

qs = sorted(final["queries"])
ratios = [r15sw["queries"][k] / final["queries"][k] for k in qs]
gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
print("\nSAME-WINDOW speedup r15->final: total %.2fx, per-query geomean %.3fx"
      % (r15sw["value"] / final["value"], gm))

rows = sorted(((r15sw["queries"][k] - final["queries"][k], k) for k in qs), reverse=True)
print("\n-- top same-window improvements --")
for d, k in rows[:22]:
    print("%-28s %6.2f -> %6.2f  (%4.2fx)"
          % (k, r15sw["queries"][k], final["queries"][k],
             r15sw["queries"][k] / final["queries"][k]))
print("\n-- same-window regressions > 15%% and > 0.15 s --")
n = 0
for d, k in rows[::-1]:
    a, b = r15sw["queries"][k], final["queries"][k]
    if b > a * 1.15 and b - a > 0.15:
        print("%-28s %6.2f -> %6.2f  (%4.2fx)" % (k, a, b, a / b))
        n += 1
print("(none)" if n == 0 else "")
