"""Progressive-MSA oracle (MUSCLE-3.8-shaped, align/prog_msa.py) tests:
structural invariants, exact consensus on clean reads, and star-vs-oracle
call-level concordance on ONT-like noise (the fast CI slice of
tools/msa_divergence.py; the full 2000-window report lives in RESULTS.md).

Reference behavior being modelled: the MUSCLE subprocess at
/root/reference/nanocaller_src/generate_indel_pileups.py:29-31.
"""

import numpy as np
import pytest

from nanocaller_tpu.align.prog_msa import (kmer_distance_matrix,
                                           profile_align, prog_msa,
                                           progressive_msa, upgma)
from nanocaller_tpu.align.msa import star_msa
from nanocaller_tpu.pileup.indel_features import allele_prediction

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from msa_divergence import gen_window  # noqa: E402

from fixtures import random_seq


class TestStructure:
    def test_rows_same_length_and_degap_roundtrip(self):
        rng = np.random.default_rng(0)
        seqs = [random_seq(rng, int(rng.integers(40, 80))) for _ in range(7)]
        rows = progressive_msa(seqs)
        assert len({len(r) for r in rows}) == 1
        assert [r.replace("-", "") for r in rows] == seqs  # order preserved

    def test_single_and_pair(self):
        assert progressive_msa(["ACGT"]) == ["ACGT"]
        rows = progressive_msa(["ACGTACGT", "ACGACGT"])
        assert [r.replace("-", "") for r in rows] == ["ACGTACGT", "ACGACGT"]
        # the shorter row must carry exactly one gap column
        assert rows[1].count("-") == 1 and rows[0].count("-") == 0

    def test_identical_seqs_no_gaps(self):
        rows = progressive_msa(["ACGTTGCA"] * 5)
        assert rows == ["ACGTTGCA"] * 5

    def test_kmer_distance_properties(self):
        rng = np.random.default_rng(1)
        a = random_seq(rng, 60)
        b = random_seq(rng, 60)
        D = kmer_distance_matrix([a, a, b])
        assert D[0, 1] == 0.0  # identical sequences share all k-mers
        assert D[0, 2] > D[0, 1]
        assert np.allclose(D, D.T) and np.all(np.diag(D) == 0)

    def test_upgma_merges_closest_first(self):
        D = np.array([[0.0, 0.1, 0.9], [0.1, 0.0, 0.9], [0.9, 0.9, 0.0]])
        merges = upgma(D)
        assert merges[0] == (0, 1)
        assert len(merges) == 2

    def test_profile_align_identical_profiles(self):
        p = np.eye(5)[[0, 1, 2, 3, 0, 1]].astype(np.float64)
        ta, tb = profile_align(p, p)
        assert ta.all() and tb.all() and len(ta) == 6


class TestConsensus:
    def test_clean_reads_exact(self):
        rng = np.random.default_rng(3)
        for variant in (None, "ins", "del"):
            ref = random_seq(rng, 120)
            hap = ref
            if variant == "ins":
                hap = ref[:50] + "TTTTT" + ref[50:]
            elif variant == "del":
                hap = ref[:50] + ref[56:]
            reads = {f"r{i:02d}": hap for i in range(12)}
            flag, _, x, cns, ref_out = prog_msa(reads, ref, 1000, 2, 160)
            assert flag == 1 and ref_out == ref
            assert cns == hap, variant
            assert x.shape == (5, 128, 2)

    def test_mincov_gate(self):
        assert prog_msa({"r0": "ACGT"}, "ACGT", 1, 2, 160)[0] == 0


class TestStarConcordance:
    """CI slice of the divergence harness (tools/msa_divergence.py).

    Measured conclusion (full-scale numbers in RESULTS.md): star-vs-oracle
    divergence is dominated by ORACLE errors — MUSCLE at `-maxiters 1`
    has no iterative refinement, so progressive misalignments propagate,
    while the star MSA anchors every read to the reference window. The
    invariant we assert is therefore not high concordance but (a) a
    realistic concordance floor and (b) star being at least as accurate
    as the MUSCLE-shaped oracle against the planted truth."""

    def test_allele_concordance_and_star_dominance(self):
        rng = np.random.default_rng(11)
        n = agree = star_true = prog_true = 0
        for t in range(60):
            w = gen_window(rng, depth=20, length=120, sub_rate=0.05,
                           indel_rate=0.04, hp_slip=0.05)
            fs, _, _, cns_s, refd = star_msa(w["reads"], w["ref"],
                                             1000 + t, 4, 160)
            fp, _, _, cns_p, _ = prog_msa(w["reads"], w["ref"],
                                          1000 + t, 4, 160)
            if not (fs and fp):
                continue
            n += 1
            al_s = allele_prediction(cns_s, refd, 40)
            al_p = allele_prediction(cns_p, refd, 40)
            al_t = allele_prediction(w["hap"], w["ref"], 40)
            agree += int(al_s == al_p)
            # truth allele comparison only meaningful at hom sites (the
            # all-reads consensus of a het mixture is ambiguous)
            if not w["cat"].startswith("het"):
                star_true += int(al_s == al_t)
                prog_true += int(al_p == al_t)
        assert n >= 55
        assert agree / n >= 0.7, (agree, n)
        assert star_true >= prog_true, (star_true, prog_true)
