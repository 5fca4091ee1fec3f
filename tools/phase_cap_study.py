"""Exact-wMEC cell-budget / active-cap trade study (VERDICT r3 items 3+9).

The production exact phaser drops its active-read cap below whatshap's
15 on whole-contig blocks until the trellis fits the cell budget
(phase/wmec._block_cap). This harness measures, on long simulated
blocks across a depth grid, what each budget buys:

  - realized cap (via _block_cap) and native-DP wall time;
  - switch+flip errors of the exact haplotype vs truth;
  - all-observation MEC cost of the result.

Usage:
    python tools/phase_cap_study.py --sites 4000 --depths 40,60,100 \
        --budgets 20e6,100e6,400e6,1600e6 --blocks 3

Prints a table and ONE JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from phase_divergence import gen_block  # noqa: E402

from nanocaller_tpu.phase.wmec import (_block_cap, select_reads,  # noqa: E402
                                       wmec_exact_gt)
from nanocaller_tpu.phase.wmec_oracle import cost_of_h  # noqa: E402


def switch_flips(h, truth):
    """Flip-invariant switch+flip error count between two haplotypes."""
    d = (np.asarray(h) ^ np.asarray(truth)).astype(np.int8)
    best = np.inf
    for o in (0, 1):
        e = d ^ o
        # number of switches = transitions in e; flips = isolated ones
        best = min(best, int(np.abs(np.diff(e)).sum()))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=4000)
    ap.add_argument("--depths", default="40,60,100")
    ap.add_argument("--budgets", default="20e6,100e6,400e6,1600e6")
    ap.add_argument("--err", type=float, default=0.05)
    ap.add_argument("--span", default="10,25")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    depths = [int(x) for x in args.depths.split(",")]
    budgets = [int(float(x)) for x in args.budgets.split(",")]
    lo_span, hi_span = (int(x) for x in args.span.split(","))
    rows = []
    for depth in depths:
        blocks = []
        for b in range(args.blocks):
            rng = np.random.default_rng(args.seed * 1000 + depth * 10 + b)
            blocks.append(gen_block(rng, args.sites, depth, args.err,
                                    lo_span, hi_span))
        for budget in budgets:
            cap = _block_cap(args.sites, 15, budget)
            t_sel = t_dp = 0.0
            sw = mec = 0
            for rids, sidx, alleles, n_reads, truth in blocks:
                t0 = time.perf_counter()
                keep = select_reads(rids, sidx, n_reads, max_cov=cap)
                t_sel += time.perf_counter() - t0
                t0 = time.perf_counter()
                # pass the budget unscaled: the native trellis now
                # accepts blocks up to 16x the budget via checkpointed
                # backtrace (round 5), so budget*4 here would force the
                # full-store path into multi-GB parent arrays
                _c, h_ex, _a2, _p = wmec_exact_gt(
                    rids[keep], sidx[keep], alleles[keep], args.sites,
                    np.ones(args.sites, np.int8), 1e30, max_active=cap,
                    cell_budget=max(budget, 64_000_000))
                t_dp += time.perf_counter() - t0
                sw += switch_flips(h_ex, truth)
                mec += cost_of_h(rids, sidx, alleles, h_ex)
            n = len(blocks)
            rows.append({
                "depth": depth, "budget": budget, "cap": cap,
                "select_s": round(t_sel / n, 3),
                "dp_s": round(t_dp / n, 3),
                "switch_flip_per_block": round(sw / n, 2),
                "mec_per_block": round(mec / n, 1),
            })
            r = rows[-1]
            print("depth=%3d budget=%8.0e cap=%2d  select %.3fs  dp %6.3fs"
                  "  sw+flip %.2f  MEC %.1f"
                  % (depth, budget, cap, r["select_s"], r["dp_s"],
                     r["switch_flip_per_block"], r["mec_per_block"]))
    print(json.dumps({"sites": args.sites, "err": args.err, "rows": rows}))


if __name__ == "__main__":
    main()
