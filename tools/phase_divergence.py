"""Heuristic-vs-exact wMEC phasing differential (VERDICT r1 item #2).

The production phaser (phase/mec.py) is a seeded alternating MEC
descent; `whatshap phase` — what the reference runs at
/root/reference/nanocaller_src/indelCaller.py:228,238 — solves weighted
MEC exactly (Patterson et al. 2015 DP, reimplemented in-repo as
phase/wmec_oracle.py). This harness measures the heuristic's gap to the
exact optimum over hundreds of simulated phase blocks across a
depth × error-rate × read-span grid:

  - MEC optimality: how often cost(heuristic h) == exact optimum, and
    the mean/max relative gap when it doesn't;
  - switch errors of the heuristic haplotype vs the exact haplotype and
    vs the simulated truth (flip-invariant, per block);
  - haplotype accuracy vs truth for both (does the exact solver actually
    phase better, or do both sit on the noise floor?).

Usage:
    python tools/phase_divergence.py --blocks 100 --seed 0
Prints a per-config table and one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from nanocaller_tpu.phase.mec import phase_obs  # noqa: E402
from nanocaller_tpu.phase.wmec_oracle import cost_of_h, wmec_exact  # noqa: E402


def gen_block(rng, n_sites, depth, err, min_span, max_span):
    """One simulated phase block: reads of `span` consecutive het sites,
    alleles from a random truth haplotype with per-observation flip
    probability `err`. Returns (rids, sidx, alleles, n_reads, truth_h)."""
    truth = rng.integers(0, 2, n_sites).astype(np.int8)
    rid_l, sidx_l, al_l = [], [], []
    n_reads = 0
    # lay reads so average per-site coverage ~= depth
    span_mean = (min_span + max_span) / 2
    n = max(2, int(round(depth * n_sites / span_mean)))
    for _ in range(n):
        span = int(rng.integers(min_span, max_span + 1))
        start = int(rng.integers(0, max(1, n_sites - span + 1)))
        side = int(rng.integers(0, 2))
        for j in range(start, min(n_sites, start + span)):
            a = truth[j] if side == 0 else 1 - truth[j]
            if rng.random() < err:
                a = 1 - a
            rid_l.append(n_reads)
            sidx_l.append(j)
            al_l.append(a)
        n_reads += 1
    return (np.array(rid_l, np.int32), np.array(sidx_l, np.int32),
            np.array(al_l, np.int8), n_reads, truth)


def switch_errors(ha, hb):
    """Flip-invariant switch-error count between two haplotype vectors."""
    d = (np.asarray(ha) ^ np.asarray(hb)).astype(np.int8)
    return int(np.count_nonzero(np.diff(d)))


def run_config(rng, blocks, n_sites, depth, err, min_span, max_span):
    out = {"n": 0, "optimal": 0, "optimal_prod": 0, "gaps": [],
           "sw_vs_exact": [], "sw_heur_truth": [], "sw_exact_truth": [],
           "skipped": 0}
    for _ in range(blocks):
        rids, sidx, al, n_reads, truth = gen_block(
            rng, n_sites, depth, err, min_span, max_span)
        pos = np.arange(n_sites, dtype=np.int64) * 100
        # heuristic-only (descent + switch repair) vs PRODUCTION
        # (heuristic + per-block exact DP over selected reads, the
        # phase_obs default since round 3)
        res = phase_obs(rids, sidx, al, n_reads, pos, exact=False)
        res_prod = phase_obs(rids, sidx, al, n_reads, pos)
        try:
            c_exact, h_exact, _ = wmec_exact(rids, sidx, al, n_sites)
        except ValueError:  # active coverage blew the DP cap
            out["skipped"] += 1
            continue
        c_heur = cost_of_h(rids, sidx, al, res.hap_allele)
        c_prod = cost_of_h(rids, sidx, al, res_prod.hap_allele)
        assert c_heur >= c_exact - 1e-9, (c_heur, c_exact)
        assert c_prod >= c_exact - 1e-9, (c_prod, c_exact)
        out["n"] += 1
        out["optimal"] += int(abs(c_heur - c_exact) < 1e-9)
        out["optimal_prod"] += int(abs(c_prod - c_exact) < 1e-9)
        out["gaps"].append((c_heur - c_exact) / max(c_exact, 1.0))
        out["sw_vs_exact"].append(switch_errors(res.hap_allele, h_exact))
        out["sw_heur_truth"].append(switch_errors(res.hap_allele, truth))
        out["sw_exact_truth"].append(switch_errors(h_exact, truth))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=100)
    ap.add_argument("--sites", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    grid = [(d, e, lo, hi)
            for d in (8, 12)
            for e in (0.02, 0.05, 0.10, 0.15)
            for (lo, hi) in ((3, 6), (4, 10))]
    print(f"{'depth':>5} {'err':>5} {'span':>6} {'n':>4} {'opt%':>6} "
          f"{'gap_mean':>9} {'gap_max':>8} {'sw/exact':>9} "
          f"{'sw_h/tru':>9} {'sw_e/tru':>9}")
    summary = []
    for d, e, lo, hi in grid:
        r = run_config(rng, args.blocks, args.sites, d, e, lo, hi)
        n = max(r["n"], 1)
        gaps = np.array(r["gaps"]) if r["gaps"] else np.zeros(1)
        row = {
            "depth": d, "err": e, "span": [lo, hi], "n": r["n"],
            "optimal_rate": r["optimal"] / n,
            "optimal_rate_prod": r["optimal_prod"] / n,
            "gap_mean": float(gaps.mean()),
            "gap_max": float(gaps.max()),
            "sw_vs_exact_mean": float(np.mean(r["sw_vs_exact"])),
            "sw_heur_truth_mean": float(np.mean(r["sw_heur_truth"])),
            "sw_exact_truth_mean": float(np.mean(r["sw_exact_truth"])),
            "skipped": r["skipped"],
        }
        summary.append(row)
        print(f"{d:>5} {e:>5.2f} {lo}-{hi:>3} {r['n']:>4} "
              f"{row['optimal_rate']*100:>5.1f}% {row['gap_mean']:>9.4f} "
              f"{row['gap_max']:>8.3f} {row['sw_vs_exact_mean']:>9.3f} "
              f"{row['sw_heur_truth_mean']:>9.3f} "
              f"{row['sw_exact_truth_mean']:>9.3f}")
    agg = {
        "blocks_per_config": args.blocks,
        "optimal_rate": float(np.mean([r["optimal_rate"] for r in summary])),
        "optimal_rate_prod": float(np.mean([r["optimal_rate_prod"]
                                            for r in summary])),
        "gap_mean": float(np.mean([r["gap_mean"] for r in summary])),
        "sw_vs_exact_mean": float(np.mean([r["sw_vs_exact_mean"]
                                           for r in summary])),
        "sw_heur_truth_mean": float(np.mean([r["sw_heur_truth_mean"]
                                             for r in summary])),
        "sw_exact_truth_mean": float(np.mean([r["sw_exact_truth_mean"]
                                              for r in summary])),
        "configs": summary,
    }
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
