"""Group-level SNP device payload vs the per-chunk path (byte identity).

SnpGroupFeatures ships ONE interval+exception observation table per
decode group and computes cell codes table-free on device
(snp_caller._group_cell_codes). Probabilities — and therefore the VCF —
must be BITWISE-identical to the per-chunk SnpChunkFeatures path for
every member (VERDICT r4 next-1: "bitwise-safe by construction").
"""

import gzip

import numpy as np
import pytest

import jax.numpy as jnp

from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.pileup.snp_features import (SnpGroupFeatures,
                                                get_snp_chunk_features,
                                                get_snp_group_payload)
from nanocaller_tpu.snp_caller import (SnpCallerState, _build_obs_tables_impl,
                                       _group_cell_codes, infer_snp_chunk,
                                       infer_snp_group)

from fixtures import make_fixture


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("group_payload")
    return make_fixture(tmp, depth=36, L=60000, read_len=2500, seed=13,
                        error_rate=0.03)


@pytest.fixture(scope="module")
def handles(fixture_paths):
    fasta_p, bam_p, _, _ = fixture_paths
    return BamReader(bam_p), FastaFile(fasta_p)


@pytest.fixture(scope="module")
def state():
    return SnpCallerState.create("ONT-HG002", mesh=None)


MEMBERS = [
    {"chrom": "chr_t", "start": 1, "end": 20000, "ploidy": "diploid"},
    {"chrom": "chr_t", "start": 20000, "end": 40000, "ploidy": "diploid"},
    {"chrom": "chr_t", "start": 40000, "end": 60000, "ploidy": "diploid"},
]


class Cfg:
    batch_size = 128
    disable_coverage_normalization = False


def _payload(bam, fasta, members, **kw):
    gf = get_snp_group_payload(bam, fasta, members, **kw)
    assert isinstance(gf, SnpGroupFeatures), type(gf)
    gf.members = [(i, sec) for i, (_m, sec) in enumerate(gf.members)]
    return gf


class TestProbIdentity:
    @pytest.mark.parametrize("seq_type", ["ont", "short_ont", "ul_ont",
                                          "ul_ont_extreme", "pacbio"])
    def test_identical_with_deep_path(self, handles, state, seq_type):
        """maxcov below the fixture depth forces the deep (explicit-rid)
        kernel for every candidate cohort as well."""
        bam, fasta = handles
        gf = _payload(bam, fasta, MEMBERS, maxcov=24, seq_type=seq_type)
        assert sum(len(s.deep_idx) for _, s in gf.members if s) > 0
        outs = infer_snp_group(state, gf, Cfg())
        for m, out in zip(MEMBERS, outs):
            solo = get_snp_chunk_features(bam, fasta, m, maxcov=24,
                                          seq_type=seq_type)
            want = infer_snp_chunk(state, solo, Cfg(), "diploid")
            np.testing.assert_array_equal(out, want)

    def test_identical_haploid(self, handles, state):
        bam, fasta = handles
        mem = [dict(m, ploidy="haploid") for m in MEMBERS]
        gf = _payload(bam, fasta, mem, maxcov=24)
        outs = infer_snp_group(state, gf, Cfg())
        for m, out in zip(mem, outs):
            solo = get_snp_chunk_features(bam, fasta, m, maxcov=24,
                                          ploidy="haploid")
            want = infer_snp_chunk(state, solo, Cfg(), "haploid")
            np.testing.assert_array_equal(out, want)

    def test_clamped_neighbor_windows(self, tmp_path_factory, state):
        """Members spanning distinct windows: group-level neighbor
        arrays reach beyond each member's ±50 kb scan window, so the
        per-candidate clamps must reproduce the member-window
        truncation exactly (incl. ul_ont whose bands reach ±100 kb)."""
        tmp = tmp_path_factory.mktemp("clamp")
        fasta_p, bam_p, _, _ = make_fixture(tmp, depth=30, L=240000,
                                            read_len=2500, seed=5,
                                            error_rate=0.03)
        bam, fasta = BamReader(bam_p), FastaFile(fasta_p)
        members = [{"chrom": "chr_t", "start": 1 + i * 60000,
                    "end": (i + 1) * 60000, "ploidy": "diploid"}
                   for i in range(4)]
        for seq_type in ("ont", "ul_ont"):
            gf = _payload(bam, fasta, members, seq_type=seq_type)
            outs = infer_snp_group(state, gf, Cfg())
            for m, out in zip(members, outs):
                solo = get_snp_chunk_features(bam, fasta, m,
                                              seq_type=seq_type)
                want = infer_snp_chunk(state, solo, Cfg(), "diploid")
                np.testing.assert_array_equal(out, want, err_msg=seq_type)


class TestScanIdentity:
    def test_scan_vs_sequential_launches(self, state):
        """The cohort scan launch (k batches in one jit call) must be
        bitwise-identical to k separate packed launches."""
        import sys

        sys.path.insert(0, ".")
        import bench as B
        from nanocaller_tpu.snp_caller import (_pack_group_payload,
                                               _snp_forward_group_packed,
                                               _snp_forward_group_scan)

        payload, batches, s_pad, n_pad = B._example_group_payload(
            n_cands=2048, bs=512)
        b8, b16, b32 = _pack_group_payload(*payload)
        dims = dict(s_pad=s_pad, n_pad=n_pad, e_pad=len(payload[7]),
                    h_pad=0, t_pad=len(payload[5]),
                    m_pad=len(payload[11]), R=64, seq_type="ont")
        seq = [np.asarray(_snp_forward_group_packed(
            state.params, b8, b16, b32, *b, **dims)) for b in batches]
        stacked = tuple(np.stack([b[i] for b in batches])
                        for i in range(5))
        outs = np.asarray(_snp_forward_group_scan(
            state.params, b8, b16, b32, *stacked, **dims))
        for i, want in enumerate(seq):
            np.testing.assert_array_equal(outs[i], want)


class TestCellCodeOracle:
    def test_matches_table_build(self):
        """Random wire instances (incl. holes, exceptions, empty spans):
        the table-free cell-code computation must equal a gather from
        the per-chunk path's reconstructed dense table."""
        rng = np.random.default_rng(0)
        for trial in range(8):
            S = int(rng.integers(3, 40))
            N = int(rng.integers(2, 60))
            s_pad, n_pad = S + int(rng.integers(0, 5)), N
            read_lo = np.ones(n_pad, np.int32)
            read_hi = np.zeros(n_pad, np.int32)
            for r in range(N):
                if rng.random() < 0.9:
                    a, b = sorted(rng.integers(0, S, size=2))
                    read_lo[r], read_hi[r] = a, b
            site_major = rng.integers(0, 5, S).astype(np.int8)
            site_minor = rng.integers(0, 5, S).astype(np.int8)
            # span bitmask
            spans = np.where(read_hi >= read_lo, read_hi - read_lo + 1, 0)
            total = int(spans.sum())
            minor_bits = rng.integers(0, 256, (total + 7) // 8,
                                      ).astype(np.uint8) \
                if total and rng.random() < 0.8 \
                else np.zeros(0, np.uint8)
            # exceptions + holes as sorted (site, rid) pairs within spans
            cells = [(s, r) for r in range(N)
                     for s in range(read_lo[r], read_hi[r] + 1)]
            rng.shuffle(cells)
            k = len(cells)
            n_exc = int(rng.integers(0, max(1, k // 3)))
            n_hole = int(rng.integers(0, max(1, k // 6)))
            exc_cells = sorted(cells[:n_exc])
            hole_cells = sorted(cells[n_exc:n_exc + n_hole])
            exc_site = np.array([c[0] for c in exc_cells], np.int32)
            exc_rid = np.array([c[1] for c in exc_cells], np.int32)
            exc_code = rng.integers(0, 5, n_exc).astype(np.int8)
            hole_site = np.array([c[0] for c in hole_cells], np.int32)
            hole_rid = np.array([c[1] for c in hole_cells], np.int32)

            # oracle: dense table via the per-chunk build (its exc wire
            # packs (rid<<3)|code per site-CSR)
            exc_packed = ((exc_rid.astype(np.int64) << 3)
                          | exc_code.astype(np.int64)).astype(np.uint32)
            exc_indptr_s = np.searchsorted(
                exc_site, np.arange(S + 1, dtype=np.int32)).astype(np.int32)
            pad_site = np.full(s_pad, 4, np.int8)
            obs_mask, table = _build_obs_tables_impl(
                jnp.asarray(read_lo), jnp.asarray(read_hi),
                jnp.asarray(np.concatenate([site_major,
                                            pad_site[:s_pad - S]])),
                jnp.asarray(np.concatenate([site_minor,
                                            pad_site[:s_pad - S]])),
                jnp.asarray(minor_bits), jnp.asarray(exc_packed),
                jnp.asarray(np.concatenate(
                    [exc_indptr_s,
                     np.full(s_pad - S, n_exc, np.int32)])),
                jnp.asarray(np.int32(n_exc)),
                jnp.asarray(hole_site), jnp.asarray(hole_rid),
                s_pad=s_pad, n_pad=n_pad)
            table = np.asarray(table)
            obs_mask = np.asarray(obs_mask)
            table = np.where(obs_mask, table, 4).astype(np.int8)

            # group-path lookup on random queries
            B, R, W = 5, 7, 9
            site_sel = rng.integers(0, s_pad + 1, (B, W)).astype(np.int32)
            rid = rng.integers(0, n_pad, (B, R)).astype(np.int32)
            ar = np.arange(s_pad + 2, dtype=np.int32)
            got = np.asarray(_group_cell_codes(
                jnp.asarray(read_lo), jnp.asarray(read_hi),
                jnp.asarray(minor_bits),
                jnp.asarray(np.concatenate(
                    [site_major, pad_site[:s_pad - S], [np.int8(4)]])),
                jnp.asarray(np.concatenate(
                    [site_minor, pad_site[:s_pad - S], [np.int8(4)]])),
                jnp.asarray(np.searchsorted(exc_site, ar).astype(np.int32)),
                jnp.asarray(exc_rid), jnp.asarray(exc_code),
                jnp.asarray(np.searchsorted(hole_site, ar).astype(np.int32)),
                jnp.asarray(hole_rid),
                jnp.asarray(site_sel), jnp.asarray(rid),
                s_pad, int(n_pad).bit_length() + 1))
            want = table[site_sel[:, None, :], rid[:, :, None]]
            np.testing.assert_array_equal(got, want,
                                          err_msg="trial %d" % trial)


class TestEndToEnd:
    def test_vcf_identical_group_vs_per_member(self, fixture_paths,
                                               tmp_path):
        from nanocaller_tpu.cli import main

        fasta_p, bam_p, _, _ = fixture_paths
        outs = {}
        for name, flag in (("group", []),
                           ("member", ["--no_snp_group_payload"])):
            out = str(tmp_path / name)
            res = main([
                "--bam", bam_p, "--ref", fasta_p, "--mode", "snps",
                "--output", out, "--prefix", "v", "--sample", "S",
                "--suppress_progress_bar", "--cpu", "1"] + flag)
            with gzip.open(res["snps"]) as fh:
                outs[name] = fh.read()
        assert outs["group"] == outs["member"]
        assert b"PASS" in outs["group"]

    def test_fallback_caps(self, handles, state, monkeypatch):
        """Groups beyond the payload caps fall back to the per-member
        feature list (same results, dispatched by type)."""
        import nanocaller_tpu.pileup.snp_features as sf

        bam, fasta = handles
        monkeypatch.setattr(sf, "_GROUP_MAX_READS", 4)
        res = get_snp_group_payload(bam, fasta, MEMBERS)
        assert isinstance(res, list) and len(res) == len(MEMBERS)
        for m, f in zip(MEMBERS, res):
            solo = get_snp_chunk_features(bam, fasta, m)
            np.testing.assert_array_equal(f.pos, solo.pos)
