"""Production exact-wMEC machinery (phase/wmec.py, VERDICT r2 item 2).

- read selection must cap the DP state width at every column;
- the joint genotype+phasing DP (wmec_exact_gt) must match brute-force
  enumeration over all read bipartitions with per-column genotype
  choice;
- production phase_obs (exact=True) must hit the exact wMEC optimum on
  the divergence grid whenever coverage is within the selection cap.
"""

import numpy as np
import pytest

from nanocaller_tpu.phase.mec import phase_obs
from nanocaller_tpu.phase.wmec import (components, select_reads,
                                       wmec_exact_gt)
from nanocaller_tpu.phase.wmec_oracle import cost_of_h, wmec_exact


def gen_block(rng, n_sites, depth, err, min_span, max_span):
    """Simulated phase block (same generator as tools/phase_divergence)."""
    truth = rng.integers(0, 2, n_sites).astype(np.int8)
    rid_l, sidx_l, al_l = [], [], []
    n_reads = 0
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


class TestSelectReads:
    def test_caps_active_width(self):
        rng = np.random.default_rng(0)
        rids, sidx, al, n_reads, _ = gen_block(rng, 25, 40, 0.05, 4, 10)
        keep = select_reads(rids, sidx, n_reads, max_cov=15)
        # recompute active width per column over selected multi-obs reads
        sel_r = np.unique(rids[keep])
        first = {int(r): sidx[(rids == r)].min() for r in sel_r}
        last = {int(r): sidx[(rids == r)].max() for r in sel_r}
        for j in range(25):
            active = sum(1 for r in sel_r if first[int(r)] <= j <= last[int(r)])
            assert active <= 15
        # and it selects a meaningful subset, not nothing
        assert len(sel_r) >= 10

    def test_low_coverage_keeps_everything(self):
        rng = np.random.default_rng(1)
        rids, sidx, al, n_reads, _ = gen_block(rng, 12, 8, 0.02, 3, 6)
        keep = select_reads(rids, sidx, n_reads, max_cov=15)
        cnt = np.bincount(rids, minlength=n_reads)
        multi_obs = (cnt >= 2)[rids]
        assert np.array_equal(keep, multi_obs)

    @pytest.mark.parametrize("seed", range(6))
    def test_native_greedy_matches_python(self, seed):
        """C++ greedy loop (ncio_select_greedy) vs the Python oracle,
        on sorted and unsorted observation layouts."""
        import nanocaller_tpu.phase.wmec as wm
        from nanocaller_tpu.io.native import select_greedy_native

        if select_greedy_native(np.zeros(0, np.int64),
                                np.zeros(0, np.int64),
                                np.zeros(0, np.int64), 1, 1, 1) is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(seed)
        rids, sidx, al, n_reads, _ = gen_block(
            rng, 40, 30 + 10 * (seed % 3), 0.05, 3, 12)
        perm = rng.permutation(len(rids))
        for rr, ss in ((rids, sidx), (rids[perm], sidx[perm])):
            native = select_reads(rr, ss, n_reads, max_cov=8)
            import nanocaller_tpu.io.native as ion

            orig = ion.select_greedy_native
            ion.select_greedy_native = lambda *a, **k: None
            try:
                python = select_reads(rr, ss, n_reads, max_cov=8)
            finally:
                ion.select_greedy_native = orig
            np.testing.assert_array_equal(native, python)


class TestConnectivitySelector:
    """whatshap-style connectivity-first selection
    (select_reads_connectivity, VERDICT r3 item 8)."""

    @pytest.mark.parametrize("seed", range(4))
    def test_caps_and_never_more_fragmentation(self, seed):
        from nanocaller_tpu.phase.wmec import (components,
                                               select_reads_connectivity)

        rng = np.random.default_rng(seed)
        n_sites = 60
        rids, sidx, al, n_reads, _ = gen_block(rng, n_sites, 40, 0.08,
                                               8, 20)
        for keep_fn, name in ((select_reads, "default"),
                              (select_reads_connectivity, "conn")):
            keep = keep_fn(rids, sidx, n_reads, max_cov=10)
            sel_r = np.unique(rids[keep])
            spans = {int(r): (sidx[rids == r].min(), sidx[rids == r].max())
                     for r in sel_r}
            for j in range(n_sites):
                active = sum(1 for f, l in spans.values() if f <= j <= l)
                assert active <= 10, (name, j)
        k_def = select_reads(rids, sidx, n_reads, max_cov=10)
        k_con = select_reads_connectivity(rids, sidx, n_reads, max_cov=10)

        def frag(keep):
            comp = components(rids[keep], sidx[keep], n_sites)
            return len(np.unique(comp))

        # connectivity-first must never fragment MORE than the default
        # (the whole point of the criterion)
        assert frag(k_con) <= frag(k_def)


def brute_force_gt(rids, sidx, alleles, n_sites, g_in, gq):
    """Enumerate all bipartitions of multi-obs reads; per column the
    genotype choice is independent given the partition."""
    uniq, inv, cnt = np.unique(rids, return_inverse=True, return_counts=True)
    multi = np.flatnonzero(cnt >= 2)
    keep = (cnt >= 2)[inv]
    rr = inv[keep]
    ss = sidx[keep]
    aa = alleles[keep]
    best = np.inf
    for mask in range(1 << len(multi)):
        side = np.zeros(len(uniq), np.int8)
        for i, r in enumerate(multi):
            side[r] = (mask >> i) & 1
        tot = 0.0
        for j in range(n_sites):
            m = ss == j
            s_obs = side[rr[m]]
            a_obs = aa[m]
            n_alt = float((a_obs == 1).sum())
            n_ref = float((a_obs == 0).sum())
            o0 = float(((s_obs == 0) & (a_obs == 1)).sum()
                       + ((s_obs == 1) & (a_obs == 0)).sum())
            o1 = float(((s_obs == 0) & (a_obs == 0)).sum()
                       + ((s_obs == 1) & (a_obs == 1)).sum())
            costs = {0: n_alt, 1: min(o0, o1), 2: n_ref}
            tot += min(costs[g] + (gq if g != g_in[j] else 0.0)
                       for g in (0, 1, 2))
        best = min(best, tot)
    return best


class TestJointGenotypeDP:
    @pytest.mark.parametrize("seed", range(6))
    def test_matches_brute_force(self, seed):
        rng = np.random.default_rng(seed)
        n_sites = int(rng.integers(3, 7))
        rids, sidx, al, n_reads, _ = gen_block(rng, n_sites, 5, 0.15, 2, 4)
        if n_reads > 10:  # keep brute force tractable
            m = rids < 10
            rids, sidx, al = rids[m], sidx[m], al[m]
        g_in = rng.choice([1, 1, 1, 2], n_sites).astype(np.int8)
        gq = float(rng.choice([0.5, 2.0, 5.0]))
        cost, a1, a2, part = wmec_exact_gt(rids, sidx, al, n_sites, g_in, gq)
        bf = brute_force_gt(rids, sidx, al, n_sites, g_in, gq)
        assert abs(cost - bf) < 1e-9, (cost, bf)
        # reported (a1, a2, part) must reproduce the reported cost
        side = np.zeros(int(rids.max()) + 1, np.int8)
        for r, s in part.items():
            side[r] = s
        cnt = np.bincount(rids)
        recost = 0.0
        for k in range(len(rids)):
            if cnt[rids[k]] < 2:
                continue
            hap = a1[sidx[k]] if side[rids[k]] == 0 else a2[sidx[k]]
            recost += float(al[k] != hap)
        recost += gq * float(((a1 + a2) != g_in).sum())
        assert abs(recost - cost) < 1e-9, (recost, cost)

    def test_reduces_to_het_wmec_when_gq_infinite(self):
        rng = np.random.default_rng(3)
        rids, sidx, al, n_reads, _ = gen_block(rng, 8, 6, 0.1, 3, 5)
        g_in = np.ones(8, np.int8)
        cost_gt, a1, a2, _ = wmec_exact_gt(rids, sidx, al, 8, g_in, 1e9)
        cost_het, h, _ = wmec_exact(rids, sidx, al, 8)
        assert abs(cost_gt - cost_het) < 1e-9
        assert np.array_equal((a1 + a2), np.ones(8))  # all still het

    def test_no_evidence_keeps_genotypes(self):
        g_in = np.array([1, 2, 1], np.int8)
        cost, a1, a2, part = wmec_exact_gt(
            np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.zeros(0, np.int8), 3, g_in, 1.0)
        assert cost == 0.0 and part == {}
        assert np.array_equal(a1 + a2, g_in)


class TestProductionOptimality:
    def test_exact_on_divergence_grid(self):
        """Production phase_obs must hit the exact wMEC optimum on every
        feasible block of the (depth ≤ cap) grid — the VERDICT item-2
        'done' criterion at production settings."""
        rng = np.random.default_rng(0)
        checked = 0
        for depth, err, lo, hi in [(8, 0.05, 3, 6), (8, 0.15, 4, 10),
                                   (12, 0.10, 3, 6), (12, 0.15, 4, 10)]:
            for _ in range(15):
                rids, sidx, al, n_reads, _ = gen_block(
                    rng, 25, depth, err, lo, hi)
                res = phase_obs(rids, sidx, al, n_reads,
                                np.arange(25, dtype=np.int64) * 100)
                try:
                    c_exact, h_exact, _ = wmec_exact(rids, sidx, al, 25)
                except ValueError:
                    continue
                c_prod = cost_of_h(rids, sidx, al, res.hap_allele)
                assert abs(c_prod - c_exact) < 1e-9, (c_prod, c_exact)
                checked += 1
        assert checked >= 35

    def test_never_worse_than_heuristic(self):
        rng = np.random.default_rng(7)
        for _ in range(10):
            rids, sidx, al, n_reads, _ = gen_block(rng, 30, 30, 0.15, 4, 10)
            pos = np.arange(30, dtype=np.int64) * 100
            res_h = phase_obs(rids, sidx, al, n_reads, pos, exact=False)
            res_e = phase_obs(rids, sidx, al, n_reads, pos, exact=True)
            c_h = cost_of_h(rids, sidx, al, res_h.hap_allele)
            c_e = cost_of_h(rids, sidx, al, res_e.hap_allele)
            assert c_e <= c_h


class TestComponents:
    def test_matches_reachability(self):
        # reads: {0,1}, {1,2}, {5,6}; site 3,4 isolated
        rids = np.array([0, 0, 1, 1, 2, 2])
        sidx = np.array([0, 1, 1, 2, 5, 6])
        comp = components(rids, sidx, 7)
        assert comp[0] == comp[1] == comp[2]
        assert comp[5] == comp[6]
        assert comp[3] != comp[0] and comp[4] != comp[5]


class TestNativeTrellis:
    """C++ ncio_wmec vs the Python DP: identical costs AND identical
    decisions (same state-bit layout + tie rules → same a1/a2/part)."""

    @pytest.mark.parametrize("seed", range(8))
    def test_bitwise_equal_to_python(self, seed):
        pytest.importorskip("nanocaller_tpu.io.native")
        from nanocaller_tpu.io.native import get_lib

        if get_lib() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(seed)
        n_sites = int(rng.integers(5, 40))
        rids, sidx, al, n_reads, _ = gen_block(
            rng, n_sites, 8, 0.1, 3, 8)
        g_in = rng.choice([1, 1, 2], n_sites).astype(np.int8)
        gq = float(rng.choice([0.5, 3.0, 1e30]))
        res_n = wmec_exact_gt(rids, sidx, al, n_sites, g_in, gq,
                              native=True)
        res_p = wmec_exact_gt(rids, sidx, al, n_sites, g_in, gq,
                              native=False)
        assert res_n[0] == res_p[0]
        np.testing.assert_array_equal(res_n[1], res_p[1])
        np.testing.assert_array_equal(res_n[2], res_p[2])
        assert res_n[3] == res_p[3]

    def test_whole_contig_scale_fast(self):
        from nanocaller_tpu.io.native import get_lib

        if get_lib() is None:
            pytest.skip("native library unavailable")
        import time

        rng = np.random.default_rng(1)
        n_sites = 4000
        rid_l, sidx_l, al_l = [], [], []
        truth = rng.integers(0, 2, n_sites).astype(np.int8)
        n_reads = 0
        for start in range(0, n_sites - 10, 1):
            for _ in range(2):
                side = int(rng.integers(0, 2))
                for j in range(start, min(start + 10, n_sites)):
                    a = truth[j] if side == 0 else 1 - truth[j]
                    if rng.random() < 0.05:
                        a = 1 - a
                    rid_l.append(n_reads)
                    sidx_l.append(j)
                    al_l.append(a)
                n_reads += 1
        rids = np.array(rid_l, np.int32)
        sidx = np.array(sidx_l, np.int32)
        al = np.array(al_l, np.int8)
        t0 = time.perf_counter()
        res = phase_obs(rids, sidx, al, n_reads,
                        np.arange(n_sites, dtype=np.int64) * 1500)
        dt = time.perf_counter() - t0
        # descent + selection + native exact DP on a 4k-site block; the
        # pure-Python DP alone took >2 s here
        assert dt < 15.0
        assert res.n_blocks >= 1
