"""Read-selection fidelity differential (VERDICT r3 item 8, missing #2).

The production coverage selector (phase/wmec.select_reads) is greedy by
(observation count, span); `whatshap phase` — what the reference runs —
selects CONNECTIVITY-first: coverage reduction must keep adjacent
variant pairs linked or phase blocks fragment.
phase/wmec.select_reads_connectivity reproduces that criterion (quality
tie-breaks are unavailable: this repo's allele matrix carries no
per-observation qualities by design). This harness measures, across a
depth × error × span grid, where the two selectors actually differ:

  - unlinked adjacent pairs after selection (block fragmentation —
    every unlinked pair becomes a phase-block boundary);
  - resulting block count over the selected evidence;
  - exact-DP haplotype quality (switch+flip vs truth) and all-reads
    MEC cost of each selector's solution.

Usage:
    python tools/selector_divergence.py --blocks 30 --sites 120
Prints a table and ONE JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from phase_divergence import gen_block  # noqa: E402
from phase_cap_study import switch_flips  # noqa: E402

from nanocaller_tpu.phase.wmec import (components, select_reads,  # noqa: E402
                                       select_reads_connectivity,
                                       wmec_exact_gt)
from nanocaller_tpu.phase.wmec_oracle import cost_of_h  # noqa: E402


def _eval(keep, rids, sidx, al, n_sites, truth):
    """Selection-quality metrics for one selector's obs mask."""
    rr, ss, aa = rids[keep], sidx[keep], al[keep]
    # unlinked adjacency pairs = block boundaries introduced by selection
    link = np.zeros(max(n_sites - 1, 1), np.int32)
    if len(rr):
        order = np.lexsort((ss, rr))
        r_s, s_s = rr[order], ss[order]
        same = r_s[1:] == r_s[:-1]
        for a, b in zip(s_s[:-1][same], s_s[1:][same]):
            lo, hi = (a, b) if a <= b else (b, a)
            link[lo:hi] += 1
    unlinked = int((link == 0).sum())
    comp = components(rr, ss, n_sites) if len(rr) else np.arange(n_sites)
    n_blocks = len(np.unique(comp))
    _c, h, _a2, _p = wmec_exact_gt(rr, ss, aa, n_sites,
                                   np.ones(n_sites, np.int8), 1e30,
                                   max_active=15)
    return {
        "reads": len(np.unique(rr)) if len(rr) else 0,
        "unlinked_pairs": unlinked,
        "blocks": n_blocks,
        "sw_flip_truth": switch_flips(h, truth),
        "mec_all": cost_of_h(rids, sidx, al, h),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=30)
    ap.add_argument("--sites", type=int, default=120)
    ap.add_argument("--max_cov", type=int, default=15)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    grid = [(d, e, lo, hi)
            for d in (25, 45, 80)
            for e in (0.05, 0.12)
            for (lo, hi) in ((4, 10), (10, 25))]
    rows = []
    hdr = ("depth err  span   | default: rds unlnk blks sw mec "
           "| connectivity: rds unlnk blks sw mec")
    print(hdr)
    for d, e, lo, hi in grid:
        agg = {k: {m: 0.0 for m in ("reads", "unlinked_pairs", "blocks",
                                    "sw_flip_truth", "mec_all")}
               for k in ("default", "connectivity")}
        n = 0
        for b in range(args.blocks):
            rng = np.random.default_rng(
                args.seed * 100000 + hash((d, int(e * 100), lo, hi)) % 9973
                * 100 + b)
            rids, sidx, al, n_reads, truth = gen_block(
                rng, args.sites, d, e, lo, hi)
            masks = {
                "default": select_reads(rids, sidx, n_reads,
                                        max_cov=args.max_cov),
                "connectivity": select_reads_connectivity(
                    rids, sidx, n_reads, max_cov=args.max_cov),
            }
            try:
                evs = {k: _eval(m, rids, sidx, al, args.sites, truth)
                       for k, m in masks.items()}
            except ValueError:
                continue
            n += 1
            for k, ev in evs.items():
                for mkey, v in ev.items():
                    agg[k][mkey] += v
        if n == 0:
            continue
        for k in agg:
            for mkey in agg[k]:
                agg[k][mkey] = round(agg[k][mkey] / n, 2)
        a, c = agg["default"], agg["connectivity"]
        print("%5d %.2f %2d-%-3d| %9.1f %5.2f %4.1f %5.2f %7.1f |"
              " %12.1f %5.2f %4.1f %5.2f %7.1f"
              % (d, e, lo, hi, a["reads"], a["unlinked_pairs"],
                 a["blocks"], a["sw_flip_truth"], a["mec_all"],
                 c["reads"], c["unlinked_pairs"], c["blocks"],
                 c["sw_flip_truth"], c["mec_all"]))
        rows.append({"depth": d, "err": e, "span": [lo, hi], "n": n,
                     "default": a, "connectivity": c})
    print(json.dumps({"max_cov": args.max_cov, "sites": args.sites,
                      "rows": rows}))


if __name__ == "__main__":
    main()
