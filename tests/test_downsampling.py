"""High-depth (>maxcov) downsampling coverage (VERDICT r2 item 7).

The reference samples with the unseeded stdlib RNG
(generate_SNP_pileups.py:216) — nondeterministic across runs, so no
differential is possible. This battery pins the in-repo replacement
(deterministic position-keyed sampling) where it has no oracle:
determinism, sampling-independence of the scan outputs, distributional
sanity of the picks at 300×, and dense↔dedup agreement through the
deep-candidate device path.
"""

import numpy as np
import pytest

from nanocaller_tpu.config import Config
from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.pileup.snp_features import (get_snp_candidates,
                                                get_snp_chunk_features)
from nanocaller_tpu.snp_caller import (SnpCallerState, infer_snp_batch,
                                       infer_snp_chunk)

from fixtures import make_fixture

DEPTH = 300
CHUNK = {"chrom": "chr_t", "start": 1, "end": 6000}


@pytest.fixture(scope="module")
def deep_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("deep")
    return make_fixture(tmp, depth=DEPTH, L=6000, read_len=900, seed=13,
                        error_rate=0.02)


@pytest.fixture(scope="module")
def handles(deep_fixture):
    fasta_p, bam_p, _, _ = deep_fixture
    return BamReader(bam_p), FastaFile(fasta_p)


class TestDeterministicSampling:
    def test_two_runs_bit_identical(self, handles):
        bam, fasta = handles
        a = get_snp_candidates(bam, fasta, CHUNK, maxcov=160)
        b = get_snp_candidates(bam, fasta, CHUNK, maxcov=160)
        assert (a.sampled_depth == 160).any()  # sampling really happened
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.read_mask, b.read_mask)

    def test_scan_outputs_independent_of_sampling(self, handles):
        """Candidate positions, dp, freq and strand counts come from the
        full-depth counts scan — they must be identical whether or not
        the tensor was downsampled."""
        bam, fasta = handles
        a = get_snp_candidates(bam, fasta, CHUNK, maxcov=160)
        b = get_snp_candidates(bam, fasta, CHUNK, maxcov=1000)
        assert (b.sampled_depth > 160).any()  # no sampling in b
        np.testing.assert_array_equal(a.pos, b.pos)
        np.testing.assert_array_equal(a.dp, b.dp)
        np.testing.assert_array_equal(a.freq, b.freq)
        np.testing.assert_array_equal(a.fwd_dp, b.fwd_dp)
        np.testing.assert_array_equal(a.rev_dp, b.rev_dp)
        assert (a.dp > 160).any()  # dp reports true depth, not maxcov

    def test_pick_distribution_uniform(self, handles):
        """At 300× → 160, per-site picks must be a uniform sample of the
        CSR row: mean pick position ≈ (depth−1)/2 (not a prefix bias)
        and picks differ across sites (position-keyed streams)."""
        bam, fasta = handles
        feats = get_snp_chunk_features(bam, fasta, CHUNK, maxcov=160)
        assert len(feats.deep_idx) >= 5
        rel_means = []
        pick_sets = []
        assert len(feats.hole_site) == 0  # no N skip-ops in the fixture
        for k, i in enumerate(feats.deep_idx):
            site = int(feats.cand_site[i])
            # CSR row = covering reads ascending (interval encoding)
            cov_r = np.flatnonzero((feats.read_lo <= site)
                                   & (feats.read_hi >= site))
            depth = len(cov_r)
            picks = np.searchsorted(cov_r, feats.deep_rids[k])
            np.testing.assert_array_equal(cov_r[picks], feats.deep_rids[k])
            assert picks.min() >= 0 and picks.max() < depth
            assert len(np.unique(picks)) == len(picks)  # no replacement
            rel_means.append(picks.mean() / (depth - 1))
            pick_sets.append(frozenset(picks.tolist()))
        rel_means = np.array(rel_means)
        # uniform sample of 160 of ~300 → relative mean ~0.5 ± a few %
        assert abs(rel_means.mean() - 0.5) < 0.05
        # not the same subset at every site
        assert len(set(pick_sets)) > 1
        # not simply the first maxcov reads
        assert not all(s == frozenset(range(160)) for s in pick_sets)

    def test_sampled_allele_balance_preserved(self, handles):
        """Sampling must not skew the center-column allele mix: the
        sampled alt fraction tracks the full-depth alt fraction."""
        bam, fasta = handles
        full = get_snp_candidates(bam, fasta, CHUNK, maxcov=1000)
        samp = get_snp_candidates(bam, fasta, CHUNK, maxcov=160)
        from nanocaller_tpu.pileup.snp_features import CENTER

        checked = 0
        for i in range(len(full)):
            if full.sampled_depth[i] <= 160 or full.freq[i] < 0.3:
                continue
            cf = full.codes[i, full.read_mask[i], CENTER]
            cs = samp.codes[i, samp.read_mask[i], CENTER]
            ref = int(full.center_ref[i])
            f_alt = (cf != ref).mean()
            s_alt = (cs != ref).mean()
            assert abs(f_alt - s_alt) < 0.15, (i, f_alt, s_alt)
            checked += 1
        assert checked >= 3

    def test_deep_device_path_matches_dense(self, handles):
        bam, fasta = handles
        state = SnpCallerState.create("ONT-HG002", mesh=None)
        cfg = Config(batch_size=64, maxcov=160)
        dense = get_snp_candidates(bam, fasta, CHUNK, maxcov=160)
        feats = get_snp_chunk_features(bam, fasta, CHUNK, maxcov=160)
        p1 = infer_snp_batch(state, dense, cfg, "diploid")
        p2 = infer_snp_chunk(state, feats, cfg, "diploid")
        np.testing.assert_array_equal(p1, p2)
