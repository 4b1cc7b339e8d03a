#!/usr/bin/env python3
"""Paired same-window analysis of BENCH_LOCAL.json's arm_runs series —
the round-16 instrument for the accskew-vs-uniform watch item. Each
campaign run contributes one wall per 10x kernel arm, measured
back-to-back in ONE child JVM with rotated execution order; this prints
per-run paired ratios (host era shared within a run) and a
position-controlled summary, so the arm order question is answered by
measurement instead of cross-window normalization."""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
d = json.load(open(path))
runs = defaultdict(dict)
for r in d.get("arm_runs", []):
    runs[r["run"]][r["arm"]] = r

U, S, A = ("kernel_batch_10x", "kernel_batch_10x_skew",
           "kernel_batch_10x_accskew")
print(f"{'run':>3} {'uni wall':>9} {'skew':>8} {'accskew':>8} "
      f"{'acc/uni':>7} {'skew/uni':>8}  pos(u/s/a)  mc(u/s/a)        ext(u/s/a)")
ratios, by_acc_pos = [], defaultdict(list)
for run in sorted(runs):
    g = runs[run]
    if not all(k in g and g[k]["wall"] > 0 for k in (U, S, A)):
        print(f"{run:>3} incomplete: {sorted(g)}")
        continue
    u, s, a = g[U], g[S], g[A]
    r_au, r_su = a["wall"] / u["wall"], s["wall"] / u["wall"]
    ratios.append((run, r_au, r_su))
    by_acc_pos[int(a["pos"])].append(r_au)
    print(f"{run:>3} {u['wall']:>9.1f} {s['wall']:>8.1f} {a['wall']:>8.1f} "
          f"{r_au:>7.3f} {r_su:>8.3f}  "
          f"{int(u['pos'])}/{int(s['pos'])}/{int(a['pos'])}        "
          f"{u['mc']:.2f}/{s['mc']:.2f}/{a['mc']:.2f}  "
          f"{u['ext']:.2f}/{s['ext']:.2f}/{a['ext']:.2f}")
if ratios:
    aus = sorted(r for _, r, _ in ratios)
    sus = sorted(r for _, _, r in ratios)
    print(f"\npaired acc/uni over {len(aus)} runs: "
          f"median {aus[len(aus)//2]:.3f} min {aus[0]:.3f} max {aus[-1]:.3f}")
    print(f"paired skew/uni: median {sus[len(sus)//2]:.3f} "
          f"min {sus[0]:.3f} max {sus[-1]:.3f}")
    for pos in sorted(by_acc_pos):
        v = sorted(by_acc_pos[pos])
        print(f"acc/uni when accskew at pos {pos}: "
              f"{['%.3f' % x for x in v]} (median {v[len(v)//2]:.3f})")
