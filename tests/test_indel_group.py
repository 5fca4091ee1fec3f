"""Grouped shared-decode indel feature gen vs per-chunk (byte identity).

get_indel_group_candidates decodes one window and emits pseudo-events
once for several adjacent 100 kb chunks; every member's IndelBatch must
be ELEMENT-IDENTICAL to get_indel_candidates run chunk by chunk.
"""

import numpy as np
import pytest

from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.pileup.indel_features import (IndelBatch,
                                                  get_indel_candidates,
                                                  get_indel_group_candidates)

from fixtures import make_fixture


@pytest.fixture(scope="module")
def handles(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("indel_group")
    indels = [(3000, "del", 6, "het1"), (11000, "ins", "TTTT", "hom"),
              (19000, "ins", "GGAGG", "het2"), (27000, "del", 4, "het2"),
              (35000, "ins", "ACAC", "het1")]
    fasta_p, bam_p, _, _ = make_fixture(
        tmp, depth=34, L=40000, read_len=2600, seed=21, indels=indels,
        tag_haplotypes=True, error_rate=0.03)
    return BamReader(bam_p), FastaFile(fasta_p)


MEMBERS = [
    {"chrom": "chr_t", "start": 1, "end": 10000, "ploidy": "diploid"},
    {"chrom": "chr_t", "start": 10000, "end": 20000, "ploidy": "diploid"},
    {"chrom": "chr_t", "start": 20000, "end": 30000, "ploidy": "diploid"},
    {"chrom": "chr_t", "start": 30000, "end": 40000, "ploidy": "diploid"},
]


def assert_batches_equal(a, b):
    assert type(a) is type(b)
    assert a.pos == b.pos
    if isinstance(a, IndelBatch):
        for f in ("x0", "x1", "x2"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                          err_msg=f)
        assert a.alleles == b.alleles
        assert a.phase == b.phase
    else:
        np.testing.assert_array_equal(a.x, b.x)
        assert a.alleles == b.alleles


class TestIndelGroupIdentity:
    def test_grouped_matches_per_chunk(self, handles):
        bam, fasta = handles
        grouped = get_indel_group_candidates(bam, fasta, MEMBERS)
        assert len(grouped) == len(MEMBERS)
        total = 0
        for m, g in zip(MEMBERS, grouped):
            solo = get_indel_candidates(bam, fasta, m)
            total += len(solo)
            assert_batches_equal(g, solo)
        assert total > 0

    def test_grouped_with_tags(self, handles):
        """Tag-injection path (phase→indel handoff) identity."""
        bam, fasta = handles
        import nanocaller_tpu.pileup.engine as eng

        rw = eng.decode_reads(bam, "chr_t", 0, 40000)
        tags = {qn: (int(h), 1) for qn, h in zip(rw.qnames, rw.hp) if h}
        grouped = get_indel_group_candidates(bam, fasta, MEMBERS[:2],
                                             tags=tags)
        for m, g in zip(MEMBERS[:2], grouped):
            solo = get_indel_candidates(bam, fasta, m, tags=tags)
            assert_batches_equal(g, solo)

    def test_haploid_members(self, handles):
        bam, fasta = handles
        hap = [dict(m, ploidy="haploid") for m in MEMBERS[:2]]
        grouped = get_indel_group_candidates(bam, fasta, hap)
        for m, g in zip(hap, grouped):
            solo = get_indel_candidates(bam, fasta, m, ploidy="haploid")
            assert_batches_equal(g, solo)

    def test_fallback_without_native(self, handles):
        """When the deferred decode is unavailable the group call must
        fall back to identical per-chunk results."""
        bam, fasta = handles
        import nanocaller_tpu.pileup.indel_features as inf

        orig = None
        import nanocaller_tpu.pileup.engine as eng

        orig = eng.indel_deferred_decode
        eng.indel_deferred_decode = lambda *a, **k: None
        try:
            grouped = get_indel_group_candidates(bam, fasta, MEMBERS[:2])
            for m, g in zip(MEMBERS[:2], grouped):
                solo = get_indel_candidates(bam, fasta, m)
                assert_batches_equal(g, solo)
        finally:
            eng.indel_deferred_decode = orig
