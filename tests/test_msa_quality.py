"""Quantify star-MSA consensus accuracy (the MUSCLE-replacement risk,
SURVEY.md §7.4.1): simulate read windows from a known haplotype sequence
under ONT-like substitution + indel noise and measure how often the MSA
consensus reconstructs the true haplotype exactly.

These are accuracy-floor tests (thresholds deliberately below measured
performance); the measured rates are printed for RESULTS.md.
"""

import numpy as np
import pytest

from nanocaller_tpu.align.msa import star_msa

from fixtures import random_seq


def noisy_copy(rng, seq, sub_rate, indel_rate):
    out = []
    for ch in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue  # deletion error
        if r < indel_rate:
            out.append("ACGT"[rng.integers(0, 4)])  # insertion error
        if rng.random() < sub_rate:
            out.append("ACGT"[rng.integers(0, 4)])
        else:
            out.append(ch)
    return "".join(out)


def consensus_accuracy(rng, n_trials, depth, sub_rate, indel_rate,
                       variant=None):
    exact = 0
    for t in range(n_trials):
        ref = random_seq(rng, 120)
        hap = ref
        if variant == "ins":
            hap = ref[:50] + "TTTTT" + ref[50:]
        elif variant == "del":
            hap = ref[:50] + ref[56:]
        reads = {"r%03d" % i: noisy_copy(rng, hap, sub_rate, indel_rate)
                 for i in range(depth)}
        flag, _, tensor, cns, ref_out = star_msa(reads, ref, 1000 + t,
                                                 2, 160)
        assert flag == 1
        if cns == hap:
            exact += 1
    return exact / n_trials


class TestConsensusAccuracy:
    def test_clean_reads(self):
        rng = np.random.default_rng(0)
        acc = consensus_accuracy(rng, 30, depth=20, sub_rate=0.0,
                                 indel_rate=0.0)
        assert acc == 1.0

    @pytest.mark.parametrize("variant", [None, "ins", "del"])
    def test_ont_noise(self, variant):
        """~9% total error (5% subs + 4% indels), 30x: consensus must
        reconstruct the haplotype (incl. a 5-6bp variant) nearly always."""
        rng = np.random.default_rng(7)
        acc = consensus_accuracy(rng, 30, depth=30, sub_rate=0.05,
                                 indel_rate=0.04, variant=variant)
        print("consensus accuracy (%s): %.2f" % (variant or "ref", acc))
        assert acc >= 0.9, (variant, acc)

    def test_low_depth_noise(self):
        rng = np.random.default_rng(9)
        acc = consensus_accuracy(rng, 30, depth=10, sub_rate=0.05,
                                 indel_rate=0.04, variant="ins")
        print("consensus accuracy (10x ins): %.2f" % acc)
        assert acc >= 0.7, acc
