import numpy as np
import pytest

from nanocaller_tpu.align.nw import (
    cigar_to_strings,
    nw_align,
    score_alignment,
)
from nanocaller_tpu.align.msa import msa_tensor, project_alignments, star_msa


def brute_force_affine(q, r, match=20, mismatch=-10, open_=9, ext=1):
    """O(nm) reference DP, cell-by-cell, no tricks (test oracle)."""
    n, m = len(q), len(r)
    NEG = -(1 << 30)
    H = [[NEG] * (m + 1) for _ in range(n + 1)]
    V = [[NEG] * (m + 1) for _ in range(n + 1)]
    Z = [[NEG] * (m + 1) for _ in range(n + 1)]
    H[0][0] = 0
    for i in range(1, n + 1):
        V[i][0] = -(open_ + (i - 1) * ext)
        H[i][0] = V[i][0]
    for j in range(1, m + 1):
        Z[0][j] = -(open_ + (j - 1) * ext)
        H[0][j] = Z[0][j]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if (q[i - 1] == r[j - 1] and q[i - 1] in "ACGT") else mismatch
            V[i][j] = max(H[i - 1][j] - open_, V[i - 1][j] - ext)
            Z[i][j] = max(H[i][j - 1] - open_, Z[i][j - 1] - ext)
            H[i][j] = max(H[i - 1][j - 1] + s, V[i][j], Z[i][j])
    return H[n][m]


def rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


class TestNW:
    def test_identical(self):
        s, cig = nw_align("ACGTACGT", "ACGTACGT")
        assert s == 8 * 20
        assert cig == [(7, 8)]

    def test_single_mismatch(self):
        s, cig = nw_align("ACGTACGT", "ACGTTCGT")
        assert s == 7 * 20 - 10
        assert cig == [(7, 4), (8, 1), (7, 3)]

    def test_insertion(self):
        # query has 2 extra bases: gap of length 2 costs open + 1*ext
        s, cig = nw_align("ACGTTTACGT", "ACGTACGT")
        assert s == 8 * 20 - (9 + 1 * 1)
        assert sum(l for op, l in cig if op == 1) == 2
        q, r = cigar_to_strings(cig, "ACGTTTACGT", "ACGTACGT")
        assert q.replace("-", "") == "ACGTTTACGT"
        assert r.replace("-", "") == "ACGTACGT"
        assert len(q) == len(r)

    def test_deletion(self):
        s, cig = nw_align("ACGTACGT", "ACGTCCCACGT")
        assert s == 8 * 20 - (9 + 2 * 1)
        assert sum(l for op, l in cig if op == 2) == 3

    def test_score_matches_bruteforce_random(self):
        rng = np.random.default_rng(9)
        for trial in range(25):
            n = int(rng.integers(1, 40))
            m = int(rng.integers(1, 40))
            q, r = rand_seq(rng, n), rand_seq(rng, m)
            want = brute_force_affine(q, r)
            got, cig = nw_align(q, r)
            assert got == want, (trial, q, r)
            # cigar consistency: consumes full seqs and rescores to `got`
            assert sum(l for op, l in cig if op in (1, 7, 8)) == n
            assert sum(l for op, l in cig if op in (2, 7, 8)) == m
            assert score_alignment(cig, q, r) == got, (trial, q, r, cig)

    def test_score_matches_bruteforce_related(self):
        # realistic case: query = mutated ref
        rng = np.random.default_rng(10)
        for trial in range(15):
            r = rand_seq(rng, 120)
            q = list(r)
            for _ in range(4):
                p = int(rng.integers(0, len(q) - 5))
                kind = rng.integers(0, 3)
                if kind == 0:
                    q[p] = "ACGT"[int(rng.integers(0, 4))]
                elif kind == 1:
                    q.insert(p, rand_seq(rng, int(rng.integers(1, 6))))
                else:
                    del q[p : p + int(rng.integers(1, 6))]
            qs = "".join(q)
            want = brute_force_affine(qs, r)
            got, cig = nw_align(qs, r)
            assert got == want, trial
            assert score_alignment(cig, qs, r) == got, trial

    def test_empty(self):
        assert nw_align("", "ACG")[1] == [(2, 3)]
        assert nw_align("ACG", "")[1] == [(1, 3)]


class TestMSA:
    def test_project_simple(self):
        ref = "ACGTACGT"
        seqs = ["ACGTACGT", "ACGTTTACGT", "ACGACGT"]
        cigars = [nw_align(s, ref, match=5, mismatch=-4, gap_open=8, gap_extend=1)[1]
                  for s in seqs]
        rows, ref_row = project_alignments(seqs, cigars, ref)
        assert len(set(len(r) for r in rows + [ref_row])) == 1
        assert ref_row.replace("-", "") == ref
        for s, row in zip(seqs, rows):
            assert row.replace("-", "") == s

    def test_consensus_recovers_insertion(self):
        ref = "ACGTACGTACGTACGTACGT"
        mutated = "ACGTACGTAAATTTCGTACGTACGT"[:25]
        reads = {("r%d" % i): mutated for i in range(10)}
        flag, _, tensor, cns, ref_out = star_msa(reads, ref, 100, 2, 160)
        assert flag == 1
        assert tensor.shape == (5, 128, 2)
        assert ref_out == ref
        assert cns == mutated

    def test_consensus_recovers_deletion(self):
        ref = "ACGTACGTACGTACGTACGTAACCGGTT"
        mutated = ref[:8] + ref[14:]
        reads = {("r%d" % i): mutated for i in range(8)}
        flag, _, tensor, cns, ref_out = star_msa(reads, ref, 100, 2, 160)
        assert flag == 1
        assert cns == mutated

    def test_mixed_haplotypes_majority(self):
        ref = "ACGTACGTACGTACGTACGTAACCGGTT"
        alt = ref[:10] + "TTTT" + ref[10:]
        reads = {}
        for i in range(6):
            reads["a%d" % i] = alt
        for i in range(3):
            reads["b%d" % i] = ref
        flag, _, tensor, cns, _ = star_msa(reads, ref, 100, 2, 160)
        assert flag == 1
        assert cns == alt  # majority wins

    def test_mincov_gate(self):
        assert star_msa({"r1": "ACGT"}, "ACGT", 0, 2, 160)[0] == 0

    def test_tensor_formula(self):
        # hand-computed tiny case: 2 reads, one with a gap
        rows = ["AC-T", "ACGT"]
        ref_row = "ACGT"
        tensor, cns, ref_d = msa_tensor(rows, ref_row)
        assert ref_d == "ACGT"
        assert cns == "ACGT"  # gap loses argmax after -0.01 nudge at 50/50
        # col 2: read freq G=0.5, -=0.5; ref one-hot G
        np.testing.assert_allclose(tensor[1, 2, 0], 0.5 - 1.0)  # G channel
        np.testing.assert_allclose(tensor[4, 2, 0], 0.5)  # '-' channel
        np.testing.assert_allclose(tensor[1, 2, 1], 1.0)
        # padding beyond 4 cols is zero
        assert np.abs(tensor[:, 4:, :]).sum() == 0


class TestBandedNW:
    """The C++ batch kernel runs a banded ladder (w=18 → w=48 → full)
    with a strict score-bound acceptance check: a banded result is kept
    only when its score strictly beats a rigorous upper bound on any
    path leaving the corridor, so cigars/scores are identical to the
    full DP by construction — including at divergence rates that force
    every ladder level and the full-matrix backstop."""

    @staticmethod
    def _mutate(rng, s, err):
        out = []
        BASES = "ACGT"
        for ch in s:
            r = rng.random()
            if r < err * 0.175:
                continue
            if r < err * 0.35:
                out.append(BASES[rng.integers(4)])
                out.append(ch)
            elif r < err:
                out.append(BASES[rng.integers(4)])
            else:
                out.append(ch)
        return "".join(out)

    @pytest.mark.parametrize("scores", [(5, -4, 8, 1), (20, -10, 9, 1)])
    @pytest.mark.parametrize("err", [0.0, 0.05, 0.25, 0.45])
    def test_banded_matches_full(self, scores, err):
        from nanocaller_tpu.align.nw import _codes
        from nanocaller_tpu.io.native import nw_batch_native

        rng = np.random.default_rng(int(err * 100) + scores[0])
        ma, mi, go, ge = scores
        pairs = []
        for _ in range(48):
            L = int(rng.integers(20, 220))
            ref = rand_seq(rng, L)
            q = self._mutate(rng, ref, err)
            if rng.random() < 0.3:  # structural indel: large drift
                p = int(rng.integers(0, max(1, len(q))))
                if rng.random() < 0.5:
                    q = q[:p] + rand_seq(
                        rng, int(rng.integers(1, 40))) + q[p:]
                else:
                    q = q[:p] + q[p + int(rng.integers(
                        1, min(40, len(q) - p + 1))):]
            pairs.append((q, ref))
        out = nw_batch_native([_codes(q) for q, _ in pairs],
                              [_codes(r) for _, r in pairs],
                              ma, mi, go, ge)
        if out is None:
            pytest.skip("native library unavailable")
        cigs, scs = out
        for k, (q, r) in enumerate(pairs):
            s_ref, cig_ref = nw_align(q, r, match=ma, mismatch=mi,
                                      gap_open=go, gap_extend=ge)
            assert scs[k] == s_ref, (scores, err, k)
            assert cigs[k] == cig_ref, (scores, err, k)

    def test_packed_roundtrip(self):
        from nanocaller_tpu.align.nw import (align_pairs_host, pack_cigar,
                                             unpack_cigar)

        rng = np.random.default_rng(3)
        pairs = []
        for _ in range(30):
            ref = rand_seq(rng, int(rng.integers(10, 150)))
            pairs.append((self._mutate(rng, ref, 0.1), ref))
        plain = align_pairs_host(pairs)
        packed = align_pairs_host(pairs, packed=True)
        for a, b in zip(plain, packed):
            assert isinstance(b, np.ndarray) and b.dtype == np.uint32
            assert not b.flags.writeable
            assert unpack_cigar(b) == a
            assert unpack_cigar(pack_cigar(a)) == a
