"""Grouped shared-decode SNP scan vs per-chunk scans (byte identity).

scan_chunk_group decodes one window for several adjacent chunks (halo
sharing, VERDICT r3 next-1a); every member's arrays — and therefore the
transfer representation and the VCF — must be ELEMENT-IDENTICAL to a
standalone per-chunk scan, including the member-local read-id space.
"""

import numpy as np
import pytest

from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.pileup.snp_features import (SnpBatch, SnpChunkFeatures,
                                                get_snp_candidates,
                                                get_snp_chunk_features,
                                                get_snp_group_features)
from nanocaller_tpu.snp_caller import _group_adjacent

from fixtures import make_fixture


@pytest.fixture(scope="module")
def handles(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("snp_group")
    fasta_p, bam_p, _, _ = make_fixture(tmp, depth=36, L=60000,
                                        read_len=2500, seed=13,
                                        error_rate=0.03)
    return BamReader(bam_p), FastaFile(fasta_p)


# adjacent chunks exactly as runtime/chunker.get_chunks emits them
# (start == previous end, 1-based)
MEMBERS = [
    {"chrom": "chr_t", "start": 1, "end": 20000, "ploidy": "diploid"},
    {"chrom": "chr_t", "start": 20000, "end": 40000, "ploidy": "diploid"},
    {"chrom": "chr_t", "start": 40000, "end": 60000, "ploidy": "diploid"},
]

_FEAT_FIELDS = ("read_lo", "read_hi", "exc_packed", "exc_indptr",
                "hole_site", "hole_rid", "site_ref", "cand_site",
                "cand_pos32", "nbr_pos", "nbr_union", "deep_idx",
                "deep_rids", "pos", "center_ref", "dp", "freq", "fwd_dp",
                "rev_dp", "sampled_depth", "nbr_counts")

_DENSE_FIELDS = ("pos", "codes", "read_mask", "col_ref", "col_valid",
                 "center_ref", "dp", "freq", "fwd_dp", "rev_dp",
                 "sampled_depth", "nbr_counts")


class TestGroupIdentity:
    def test_dedup_representation_identical(self, handles):
        bam, fasta = handles
        grouped = get_snp_group_features(bam, fasta, MEMBERS)
        assert len(grouped) == len(MEMBERS)
        for m, g in zip(MEMBERS, grouped):
            solo = get_snp_chunk_features(bam, fasta, m)
            assert type(g) is type(solo) is SnpChunkFeatures
            assert len(solo) > 0
            assert g.n_reads == solo.n_reads
            assert g.seq_type == solo.seq_type
            assert g.maxcov == solo.maxcov
            for f in _FEAT_FIELDS:
                np.testing.assert_array_equal(
                    getattr(g, f), getattr(solo, f), err_msg=f)

    def test_dense_representation_identical(self, handles):
        bam, fasta = handles
        grouped = get_snp_group_features(bam, fasta, MEMBERS, dedup=False)
        for m, g in zip(MEMBERS, grouped):
            solo = get_snp_candidates(bam, fasta, m)
            assert type(g) is type(solo) is SnpBatch
            for f in _DENSE_FIELDS:
                np.testing.assert_array_equal(
                    getattr(g, f), getattr(solo, f), err_msg=f)

    def test_python_decoder_fallback_identical(self, handles):
        """Group path with the pure-Python decoder (deferred decode
        unavailable) must match too."""
        bam, fasta = handles
        import nanocaller_tpu.pileup.snp_features as sf

        orig = sf.deferred_decode
        sf.deferred_decode = lambda *a, **k: None
        try:
            grouped = get_snp_group_features(bam, fasta, MEMBERS[:2])
        finally:
            sf.deferred_decode = orig
        for m, g in zip(MEMBERS[:2], grouped):
            solo = get_snp_chunk_features(bam, fasta, m)
            for f in _FEAT_FIELDS:
                np.testing.assert_array_equal(
                    getattr(g, f), getattr(solo, f), err_msg=f)

    def test_empty_member(self, handles):
        """A member with no candidates yields an empty representation in
        place (mixed groups must stay aligned)."""
        bam, fasta = handles
        far = {"chrom": "chr_t", "start": 59990, "end": 60000,
               "ploidy": "diploid"}
        grouped = get_snp_group_features(
            bam, fasta, [MEMBERS[0], far], min_allele_freq=1.1)
        assert all(len(g) == 0 for g in grouped)


class TestGrouping:
    class Cfg:
        cpu = 2
        snp_group_span = 0

    def test_groups_cover_todo_in_order(self):
        chunks = [{"chrom": "c1", "start": 1 + i * 100000,
                   "end": 100000 + i * 100000, "ploidy": "diploid"}
                  for i in range(10)]
        chunks += [{"chrom": "c2", "start": 1, "end": 50000,
                    "ploidy": "haploid"}]
        todo = list(range(len(chunks)))
        groups = _group_adjacent(chunks, todo, self.Cfg())
        flat = [i for g in groups for i, _ in g]
        assert flat == todo
        for g in groups:
            assert len({c["chrom"] for _, c in g}) == 1
            assert len({c["ploidy"] for _, c in g}) == 1

    def test_resume_gap_splits_group(self):
        chunks = [{"chrom": "c1", "start": 1 + i * 100000,
                   "end": 100000 + i * 100000, "ploidy": "diploid"}
                  for i in range(5)]
        todo = [0, 1, 3, 4]  # chunk 2 already done
        groups = _group_adjacent(chunks, todo, self.Cfg())
        flat = [[i for i, _ in g] for g in groups]
        assert flat == [[0, 1], [3, 4]]

    def test_disable(self):
        assert _group_adjacent([], [], type(
            "C", (), {"cpu": 2, "snp_group_span": -1})()) is None
