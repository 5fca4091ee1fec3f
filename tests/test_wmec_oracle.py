"""Exact-wMEC oracle tests (phase/wmec_oracle.py) + heuristic differential.

The oracle models `whatshap phase`'s exact weighted-MEC DP (the solver
the reference invokes at indelCaller.py:228,238). Verified here against
brute-force enumeration over all read bipartitions on tiny instances,
then used as the yardstick for the production heuristic (phase/mec.py).
Full-grid numbers: tools/phase_divergence.py + RESULTS.md.
"""

import itertools
import sys
import os

import numpy as np

from nanocaller_tpu.phase.mec import phase_obs
from nanocaller_tpu.phase.wmec_oracle import cost_of_h, wmec_exact

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from phase_divergence import gen_block, switch_errors  # noqa: E402


def brute_force_mec(rids, sidx, alleles, n_sites, weights=None):
    """Optimal cost by enumerating every bipartition of the reads."""
    if weights is None:
        weights = np.ones(len(rids))
    reads = np.unique(rids)
    best = np.inf
    for bits in itertools.product((0, 1), repeat=len(reads)):
        side = dict(zip(reads.tolist(), bits))
        cost = 0.0
        for j in range(n_sites):
            sel = sidx == j
            w = np.zeros((2, 2))  # [side][allele]
            for r, a, ww in zip(rids[sel], alleles[sel], weights[sel]):
                w[side[int(r)], a] += ww
            # all-het objective: haplotypes complementary at every site
            cost += min(w[0, 1] + w[1, 0], w[0, 0] + w[1, 1])
        best = min(best, cost)
    return best


class TestExactDP:
    def test_matches_brute_force_random(self):
        rng = np.random.default_rng(0)
        for trial in range(25):
            n_sites = int(rng.integers(2, 6))
            rids, sidx, al, n_reads, _ = gen_block(
                rng, n_sites, depth=int(rng.integers(3, 7)),
                err=0.2, min_span=2, max_span=n_sites)
            c_dp, h, part = wmec_exact(rids, sidx, al, n_sites)
            c_bf = brute_force_mec(rids, sidx, al, n_sites)
            assert abs(c_dp - c_bf) < 1e-9, (trial, c_dp, c_bf)
            # the returned haplotype must realize the optimal cost
            assert abs(cost_of_h(rids, sidx, al, h) - c_dp) < 1e-9

    def test_weighted_matches_brute_force(self):
        rng = np.random.default_rng(1)
        for trial in range(10):
            n_sites = int(rng.integers(2, 5))
            rids, sidx, al, n_reads, _ = gen_block(
                rng, n_sites, depth=4, err=0.25, min_span=2,
                max_span=n_sites)
            w = rng.integers(1, 5, size=len(rids)).astype(np.float64)
            c_dp, h, _ = wmec_exact(rids, sidx, al, n_sites, weights=w)
            # brute force must see the same multi-read-only instance the
            # DP solves (singletons contribute 0 either way, but keep
            # the comparison apples-to-apples)
            c_bf = brute_force_mec(rids, sidx, al, n_sites, weights=w)
            assert abs(c_dp - c_bf) < 1e-9, (trial, c_dp, c_bf)

    def test_clean_block_zero_cost(self):
        rng = np.random.default_rng(2)
        rids, sidx, al, n_reads, truth = gen_block(
            rng, 12, depth=8, err=0.0, min_span=3, max_span=6)
        c, h, part = wmec_exact(rids, sidx, al, 12)
        assert c == 0.0
        assert switch_errors(h, truth) == 0

    def test_singleton_reads_ignored(self):
        # two 1-obs reads only: nothing to phase, zero cost
        rids = np.array([0, 1], np.int32)
        sidx = np.array([0, 1], np.int32)
        al = np.array([1, 0], np.int8)
        c, h, part = wmec_exact(rids, sidx, al, 2)
        assert c == 0.0 and part == {}


class TestHeuristicVsExact:
    """CI slice of tools/phase_divergence.py: the production descent must
    sit at/near the exact optimum on realistic blocks."""

    def test_heuristic_near_optimal(self):
        rng = np.random.default_rng(7)
        n = optimal = 0
        gaps = []
        for _ in range(40):
            rids, sidx, al, n_reads, truth = gen_block(
                rng, 25, depth=10, err=0.05, min_span=3, max_span=8)
            res = phase_obs(rids, sidx, al, n_reads,
                            np.arange(25, dtype=np.int64) * 100)
            try:
                c_exact, h_exact, _ = wmec_exact(rids, sidx, al, 25)
            except ValueError:
                continue
            c_heur = cost_of_h(rids, sidx, al, res.hap_allele)
            assert c_heur >= c_exact - 1e-9
            n += 1
            optimal += int(abs(c_heur - c_exact) < 1e-9)
            gaps.append((c_heur - c_exact) / max(c_exact, 1.0))
        assert n >= 30
        # measured: with switch repair the descent hits the exact wMEC
        # optimum on nearly every block at realistic noise and is within
        # ~1% elsewhere (full grid in RESULTS.md)
        assert optimal / n >= 0.9, (optimal, n)
        assert float(np.mean(gaps)) <= 0.02, np.mean(gaps)
