"""Deduplicated chunk-transfer SNP path vs the dense oracle path.

The production streaming representation (SnpChunkFeatures + on-device
site×read table gather, VERDICT r2 item 1) must be probability-IDENTICAL
(bitwise) to the dense per-candidate representation: the gather
reconstructs exactly the codes the dense path ships, and masked reads
contribute exactly 0 to the einsum either way.
"""

import gzip

import numpy as np
import pytest

from nanocaller_tpu.config import Config
from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.pileup.snp_features import (SnpBatch, SnpChunkFeatures,
                                                get_snp_candidates,
                                                get_snp_chunk_features)
from nanocaller_tpu.snp_caller import (SnpCallerState, infer_snp_batch,
                                       infer_snp_chunk)

from fixtures import make_fixture


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dedup")
    # noisy enough for a rich candidate set
    return make_fixture(tmp, depth=36, L=40000, read_len=2500, seed=11,
                        error_rate=0.03)


@pytest.fixture(scope="module")
def handles(fixture_paths):
    fasta_p, bam_p, _, _ = fixture_paths
    return BamReader(bam_p), FastaFile(fasta_p)


@pytest.fixture(scope="module")
def state():
    return SnpCallerState.create("ONT-HG002", mesh=None)


CHUNK = {"chrom": "chr_t", "start": 1, "end": 40000}


class TestRepresentationParity:
    def test_host_fields_match_dense(self, handles):
        bam, fasta = handles
        dense = get_snp_candidates(bam, fasta, CHUNK)
        feats = get_snp_chunk_features(bam, fasta, CHUNK)
        assert isinstance(feats, SnpChunkFeatures)
        assert len(dense) == len(feats) > 0
        for f in ("pos", "center_ref", "dp", "freq", "fwd_dp", "rev_dp",
                  "sampled_depth", "nbr_counts"):
            np.testing.assert_array_equal(getattr(dense, f), getattr(feats, f))
        assert abs(dense.coverage - feats.coverage) < 1e-9

    def test_probs_bitwise_identical(self, handles, state):
        bam, fasta = handles
        dense = get_snp_candidates(bam, fasta, CHUNK)
        feats = get_snp_chunk_features(bam, fasta, CHUNK)
        cfg = Config(batch_size=128)
        p_dense = infer_snp_batch(state, dense, cfg, "diploid")
        p_dedup = infer_snp_chunk(state, feats, cfg, "diploid")
        np.testing.assert_array_equal(p_dense, p_dedup)

    def test_probs_bitwise_identical_haploid(self, handles, state):
        bam, fasta = handles
        kw = dict(ploidy="haploid", threshold=(0.3, 0.7))
        dense = get_snp_candidates(bam, fasta, CHUNK, **kw)
        feats = get_snp_chunk_features(bam, fasta, CHUNK, **kw)
        assert len(feats) > 0
        cfg = Config(batch_size=128)
        p_dense = infer_snp_batch(state, dense, cfg, "haploid")
        p_dedup = infer_snp_chunk(state, feats, cfg, "haploid")
        np.testing.assert_array_equal(p_dense, p_dedup)

    def test_deep_downsampling_path(self, handles, state):
        """maxcov below the fixture depth forces the deterministic
        position-keyed sampling; the dedup path must pick the identical
        read sets through the offsets kernel."""
        bam, fasta = handles
        dense = get_snp_candidates(bam, fasta, CHUNK, maxcov=24)
        feats = get_snp_chunk_features(bam, fasta, CHUNK, maxcov=24)
        assert len(feats.deep_idx) > 0
        cfg = Config(batch_size=128, maxcov=24)
        p_dense = infer_snp_batch(state, dense, cfg, "diploid")
        p_dedup = infer_snp_chunk(state, feats, cfg, "diploid")
        np.testing.assert_array_equal(p_dense, p_dedup)

    def test_table_cap_fallback_returns_dense(self, handles, monkeypatch):
        import nanocaller_tpu.pileup.snp_features as sf

        bam, fasta = handles
        monkeypatch.setattr(sf, "_TABLE_CELL_CAP", 16)
        out = get_snp_chunk_features(bam, fasta, CHUNK)
        assert isinstance(out, SnpBatch)
        ref = get_snp_candidates(bam, fasta, CHUNK)
        np.testing.assert_array_equal(out.codes, ref.codes)

    def test_empty_chunk(self, handles):
        bam, fasta = handles
        feats = get_snp_chunk_features(
            bam, fasta, {"chrom": "chr_t", "start": 1, "end": 40000},
            min_allele_freq=1.1)
        assert len(feats) == 0


class TestDeviceNeighborSelection:
    @pytest.mark.parametrize(
        "seq_type", ["ont", "short_ont", "ul_ont", "ul_ont_extreme",
                     "pacbio"])
    def test_matches_host_select_neighbors(self, seq_type):
        """The on-device band-quota selection must produce EXACTLY the
        host select_neighbors output (mapped to union-site indices) for
        every band schedule."""
        import jax

        from nanocaller_tpu.pileup.snp_features import (CENTER,
                                                        select_neighbors)
        from nanocaller_tpu.snp_caller import _device_select_neighbors

        rng = np.random.default_rng(3)
        # irregular site spacing spanning every band of every schedule
        gaps = rng.integers(40, 9000, 900)
        pos_all = np.cumsum(gaps).astype(np.int64)
        is_nbr = rng.random(len(pos_all)) < 0.7
        nbr_pos = pos_all[is_nbr]
        cand_pos = np.sort(rng.choice(pos_all, 160, replace=False))
        union = np.union1d(nbr_pos, cand_pos)
        host_mat, _, _ = select_neighbors(cand_pos, nbr_pos, seq_type)
        host_soc = np.where(
            host_mat >= 0,
            np.searchsorted(union, nbr_pos[np.maximum(host_mat, 0)]), -1)
        cand_site = np.searchsorted(union, cand_pos).astype(np.int32)
        host_soc[:, CENTER] = cand_site
        nbr_union = np.searchsorted(union, nbr_pos).astype(np.int32)
        dev_soc = np.asarray(jax.jit(
            _device_select_neighbors, static_argnames=("seq_type",))(
                cand_site, cand_pos.astype(np.int32),
                nbr_pos.astype(np.int32), nbr_union, seq_type=seq_type))
        np.testing.assert_array_equal(dev_soc, host_soc)


class TestEndToEnd:
    def test_vcf_identical_dedup_vs_dense(self, fixture_paths, tmp_path):
        from nanocaller_tpu.cli import main

        fasta_p, bam_p, _, _ = fixture_paths
        outs = {}
        for name, flag in (("dedup", []), ("dense", ["--no_dedup_transfer"])):
            out = str(tmp_path / name)
            res = main([
                "--bam", bam_p, "--ref", fasta_p, "--mode", "snps",
                "--output", out, "--prefix", "v", "--sample", "S",
                "--suppress_progress_bar", "--cpu", "1"] + flag)
            with gzip.open(res["snps"]) as fh:
                outs[name] = fh.read()
        assert outs["dedup"] == outs["dense"]
        assert b"PASS" in outs["dedup"]
