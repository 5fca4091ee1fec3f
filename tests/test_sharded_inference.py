"""Multi-device DP inference ≡ single-device (VERDICT round-1 item #3).

conftest.py forces 8 virtual CPU devices, so SnpCallerState/IndelCallerState
auto-build the all-dp inference mesh here — the same code path production
takes on a multi-chip host (reference analog: the N CPU worker fan-out in
nanocaller_src/snpCaller.py:213-245). These tests pin down that sharding the
candidate batches over 'dp' changes nothing observable: probabilities are
bit-identical and the final VCF bytes match a forced single-device run.
"""

import numpy as np
import pytest

import jax

from nanocaller_tpu.config import Config
from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.pileup.snp_features import get_snp_candidates
from nanocaller_tpu.runtime import get_chunks, get_regions_list
from nanocaller_tpu.snp_caller import SnpCallerState, call_snps, infer_snp_batch

from fixtures import make_fixture


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sharded")
    return make_fixture(tmp, depth=36, L=9000, read_len=1200, seed=11)


def test_mesh_auto_built_on_multidevice():
    state = SnpCallerState.create("ONT-HG002")
    assert state.mesh is not None
    assert state.mesh.shape["dp"] == len(jax.local_devices())
    single = SnpCallerState.create("ONT-HG002", mesh=None)
    assert single.mesh is None


def test_sharded_snp_probs_bitwise_equal(fixture_paths):
    fasta_p, bam_p, _ref, _snps = fixture_paths
    bam, fasta = BamReader(bam_p), FastaFile(fasta_p)
    batch = get_snp_candidates(
        bam, fasta, {"chrom": "chr_t", "start": 1, "end": 9000})
    assert len(batch) > 8
    cfg = Config(bam=bam_p, ref=fasta_p, sample="S", prefix="t",
                 snp_model="ONT-HG002", batch_size=64)
    meshed = SnpCallerState.create("ONT-HG002")
    single = SnpCallerState.create("ONT-HG002", mesh=None)
    for ploidy in ("diploid", "haploid"):
        pm = infer_snp_batch(meshed, batch, cfg, ploidy)
        ps = infer_snp_batch(single, batch, cfg, ploidy)
        np.testing.assert_array_equal(pm, ps, err_msg=ploidy)


def test_call_snps_vcf_identical_single_vs_multidevice(
        fixture_paths, tmp_path, monkeypatch):
    fasta_p, bam_p, _ref, _snps = fixture_paths
    cfg = Config(bam=bam_p, ref=fasta_p, sample="S", prefix="t",
                 snp_model="ONT-HG002", batch_size=64)
    bam, fasta = BamReader(bam_p), FastaFile(fasta_p)
    regions = get_regions_list(cfg, bam)
    chunks = get_chunks(regions, 1)

    (tmp_path / "multi").mkdir()
    (tmp_path / "single").mkdir()
    out_multi = call_snps(cfg, bam, fasta, regions, chunks,
                          str(tmp_path / "multi"))

    # force the single-device path by disabling mesh auto-detection
    import nanocaller_tpu.runtime.sharding as sharding
    monkeypatch.setattr(sharding, "inference_mesh", lambda *a, **k: None)
    out_single = call_snps(cfg, bam, fasta, regions, chunks,
                           str(tmp_path / "single"))

    from nanocaller_tpu.io.bgzf import BgzfReader

    def body(path):
        r = BgzfReader(path)
        out = b""
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                return out
            out += chunk

    assert body(out_multi) == body(out_single)


def test_sharded_indel_probs_bitwise_equal():
    from nanocaller_tpu.indel_caller import (
        IndelCallerState, infer_indel_batch, infer_haploid_indel_batch)

    rng = np.random.default_rng(5)

    class _B:
        x0 = rng.random((13, 5, 128, 2)).astype(np.float32)
        x1 = rng.random((13, 5, 128, 2)).astype(np.float32)
        x2 = rng.random((13, 5, 128, 2)).astype(np.float32)

    class _H:
        x = rng.random((13, 5, 128, 2)).astype(np.float32)

        def __len__(self):
            return 13

    meshed = IndelCallerState.create("ONT-HG002")
    single = IndelCallerState.create("ONT-HG002", mesh=None)
    assert meshed.mesh is not None and single.mesh is None
    np.testing.assert_array_equal(
        infer_indel_batch(meshed, _B, batch_size=8),
        infer_indel_batch(single, _B, batch_size=8))
    np.testing.assert_array_equal(
        infer_haploid_indel_batch(meshed, _H(), batch_size=8),
        infer_haploid_indel_batch(single, _H(), batch_size=8))
