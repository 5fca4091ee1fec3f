import numpy as np
import pytest

from nanocaller_tpu.config import Config
from nanocaller_tpu.indel_caller import (
    IndelCallerState,
    call_indel_chunk,
    decompose_record,
    is_non_snp,
    primitives_of,
    write_indel_vcf,
)
from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.io.vcf import VcfReader, VcfRecord
from nanocaller_tpu.pileup.engine import decode_reads
from nanocaller_tpu.pileup.indel_features import (
    allele_prediction,
    get_indel_candidates,
    scan_indel_candidates,
    sliding_distinct_counts,
)

from fixtures import make_fixture


class TestSlidingCounts:
    def test_vs_bruteforce(self):
        rng = np.random.default_rng(4)
        n_cols, win = 200, 7
        rids = rng.integers(0, 12, size=60)
        cols = rng.integers(0, n_cols, size=60)
        got = sliding_distinct_counts(rids, cols, n_cols, win)
        for c in range(n_cols):
            in_win = (cols > c - win) & (cols <= c)
            want = len(set(rids[in_win].tolist()))
            assert got[c] == want, c

    def test_single_read_multiple_events(self):
        # one read with events every 2 cols — must count once per window
        cols = np.array([10, 12, 14])
        rids = np.zeros(3, dtype=int)
        got = sliding_distinct_counts(rids, cols, 30, 5)
        assert got[10] == 1 and got[14] == 1 and got[18] == 1
        assert got[9] == 0 and got[19] == 0


class TestAllelePrediction:
    def test_insertion_allele(self):
        ref = "ACGTACGTAATTCCGGACGTACGT"
        alt = ref[:10] + "GGG" + ref[10:]
        r, a = allele_prediction(alt, ref, 10)
        # must capture the inserted GGG anchored on preceding bases
        assert r is not None
        assert len(a) - len(r) == 3
        assert a.startswith(r[: min(3, len(r))][:1])

    def test_deletion_allele(self):
        ref = "ACGTACGTAATTCCGGACGTACGT"
        alt = ref[:8] + ref[13:]
        r, a = allele_prediction(alt, ref, 10)
        assert r is not None
        assert len(r) - len(a) == 5

    def test_no_indel_returns_none(self):
        ref = "ACGTACGTAATTCCGGACGTACGTACGTAACCGGTTACGT" * 3
        r, a = allele_prediction(ref, ref, 10)
        assert (r, a) == (None, None)


class TestPrimitives:
    def test_snp_only(self):
        prims = primitives_of("ACGT", "AGGT")
        assert prims == [(1, "C", "G")]

    def test_insertion(self):
        prims = primitives_of("ACGT", "ACTTTGT")
        assert prims == [(1, "C", "CTTT")]

    def test_deletion(self):
        prims = primitives_of("ACGTTTGA", "ACGGA")
        assert prims == [(2, "GTTTG", "GG")] or prims == [(2, "GTTT", "G")]

    def test_complex_split(self):
        # SNP + insertion in one allele
        prims = primitives_of("ACGTACGT", "ATGTACCCGT")
        kinds = {(o, r, a) for o, r, a in prims}
        assert (1, "C", "T") in kinds
        assert any(len(a) - len(r) == 2 for _, r, a in prims)

    def test_decompose_record_multiallelic(self):
        rec = VcfRecord("c1", 100, "ACGT", "ATGT,ACGTTT", "50", "PASS",
                        format_="GT:GQ", samples=["1|2:30"])
        out = decompose_record(rec)
        gts = {(r.pos, r.ref, r.alt): r.sample_field("GT") for r in out}
        assert gts[(101, "C", "T")] == "1|0"
        # TT insertion may be anchored after G (left) or after T —
        # equivalent representations
        ins = [(k, v) for k, v in gts.items() if len(k[2]) - len(k[1]) == 2]
        assert len(ins) == 1 and ins[0][1] == "0|1", gts

    def test_non_snp_filter(self):
        assert not is_non_snp(VcfRecord("c", 1, "A", "T", ".", "PASS"))
        assert is_non_snp(VcfRecord("c", 1, "A", "AT", ".", "PASS"))
        assert is_non_snp(VcfRecord("c", 1, "AT", "A", ".", "PASS"))


@pytest.fixture(scope="module")
def indel_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("indelcall")
    indels = [
        (1500, "del", 6, "het1"),
        (3000, "ins", "TTTTT", "hom"),
        (4500, "ins", "GATC", "het2"),
    ]
    return make_fixture(tmp, depth=36, L=6000, read_len=900, seed=21,
                        snps=[], indels=indels, tag_haplotypes=True), indels


class TestScan:
    def test_candidates_near_planted(self, indel_fixture):
        (fasta_p, bam_p, ref_seq, _), indels = indel_fixture
        bam = BamReader(bam_p)
        rw = decode_reads(bam, "chr_t", 0, 6000, keep_seq=True)
        assert (rw.hp == 1).sum() > 5 and (rw.hp == 2).sum() > 5
        variants, extra = scan_indel_candidates(
            rw, np.arange(0, 6000), win_size=40, small_win_size=4,
            mincov=4, ins_t=0.4, del_t=0.6)
        vpos = sorted(variants)
        for p, kind, val, gt in indels:
            assert any(abs(v - p) <= 45 for v in vpos), (p, vpos)


class TestImputeIndelPhase:
    def test_clustering_pseudophasing_finds_het_indel(self, tmp_path):
        """--impute_indel_phase: with an UNTAGGED BAM (no HP), the
        per-column allele-clustering fallback must still produce
        candidates and calls for a het indel
        (generate_indel_pileups.py:278-304)."""
        from fixtures import make_fixture
        from nanocaller_tpu.io.fasta import FastaFile

        indels = [(2000, "del", 6, "het1")]
        fasta_p, bam_p, ref_seq, _ = make_fixture(
            tmp_path, depth=30, L=4000, read_len=900, seed=8, snps=[],
            indels=indels, tag_haplotypes=False)
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        chunk = {"chrom": "chr_t", "start": 1, "end": 4000}
        # ccs-preset thresholds (del_t=0.4) — the preset that enables
        # impute_indel_phase; a 0.5-freq het del clears the 0.4 gate
        kw = dict(seq_type="ont", mincov=4, maxcov=160, ins_t=0.4,
                  del_t=0.4, win_size=40, small_win_size=4)
        # without impute: hap coverage gate fails everywhere → nothing
        none_batch = get_indel_candidates(bam, fasta, chunk,
                                          impute_indel_phase=False, **kw)
        assert len(none_batch) == 0
        batch = get_indel_candidates(bam, fasta, chunk,
                                     impute_indel_phase=True, **kw)
        assert len(batch) >= 1
        # the pseudo-haplotypes should separate the del allele
        hits = [j for j, p in enumerate(batch.pos) if abs(p - 2001) <= 12]
        assert hits, batch.pos
        a0, a1, at = batch.alleles[hits[0]]
        diffs = {len(x[0]) - len(x[1]) for x in (a0, a1, at)
                 if x[0] and x[1]}
        assert 6 in diffs, batch.alleles[hits[0]]

        # end-to-end decode on the imputed batch (ccs-like thresholds)
        cfg = Config(bam=bam_p, ref=fasta_p, prefix="imp", sample="S",
                     impute_indel_phase=True, del_threshold=0.4)
        state = IndelCallerState.create("ONT-HG002")
        lines = call_indel_chunk(state, bam, fasta,
                                 dict(chunk, ploidy="diploid"), cfg)
        assert any(1990 <= int(l.split("\t")[1]) <= 2012 for l in lines), lines


class TestDeviceAlignmentParity:
    def test_device_path_identical(self, indel_fixture):
        (fasta_p, bam_p, ref_seq, _), indels = indel_fixture
        from nanocaller_tpu.io.fasta import FastaFile

        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        chunk = {"chrom": "chr_t", "start": 1, "end": 6000}
        kw = dict(seq_type="ont", mincov=4, maxcov=160, ins_t=0.4, del_t=0.6,
                  win_size=40, small_win_size=4)
        a = get_indel_candidates(bam, fasta, chunk, use_device_alignment=False, **kw)
        b = get_indel_candidates(bam, fasta, chunk, use_device_alignment=True, **kw)
        assert a.pos == b.pos and len(a.pos) > 0
        np.testing.assert_array_equal(a.x0, b.x0)
        np.testing.assert_array_equal(a.x1, b.x1)
        np.testing.assert_array_equal(a.x2, b.x2)
        assert a.alleles == b.alleles
        assert a.phase == b.phase


class TestEndToEndIndels:
    def test_noisy_reads_with_indel_errors(self, tmp_path):
        """Robustness: 1% sequencing-indel + 3% substitution errors (the
        ONT error profile the thresholds were designed for) must not
        bury planted indels or flood the caller with false positives."""
        from fixtures import make_diploid_readset, random_seq, write_bam
        from nanocaller_tpu.io.fasta import write_fasta, FastaFile

        rng = np.random.default_rng(31)
        L = 8000
        ref_seq = random_seq(rng, L)
        indels = [(2500, "del", 6, "het1"), (5500, "ins", "TTTTT", "hom")]
        reads = make_diploid_readset(
            rng, ref_seq, snps=[], indels=indels, depth=40, read_len=1200,
            error_rate=0.03, indel_error_rate=0.01)
        fasta_p = str(tmp_path / "n.fa")
        write_fasta(fasta_p, {"chr_t": ref_seq})
        bam_p = str(tmp_path / "n.bam")
        write_bam(bam_p, "chr_t", L, reads, tag_haplotypes=True)

        cfg = Config(bam=bam_p, ref=fasta_p, prefix="n", sample="S")
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        state = IndelCallerState.create("ONT-HG002")
        chunk = {"chrom": "chr_t", "start": 1, "end": L, "ploidy": "diploid"}
        lines = call_indel_chunk(state, bam, fasta, chunk, cfg)
        path = write_indel_vcf(cfg, ["chr_t"], [lines], str(tmp_path))
        recs = list(VcfReader(path))
        found = 0
        for p, kind, val, gt in indels:
            ln = len(val) if kind == "ins" else -val
            if any(abs(r.pos - (p + 1)) <= 3
                   and any(len(a) - len(r.ref) == ln for a in r.alt.split(","))
                   for r in recs):
                found += 1
        assert found == len(indels), [(r.pos, r.ref, r.alt) for r in recs]
        # false positives bounded (error indels are 1-2bp and unphased)
        assert len(recs) <= 12, [(r.pos, r.ref, r.alt) for r in recs]

    def test_call_recovers_planted(self, indel_fixture, tmp_path):
        (fasta_p, bam_p, ref_seq, _), indels = indel_fixture
        cfg = Config(bam=bam_p, ref=fasta_p, prefix="t", sample="S")
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        state = IndelCallerState.create("ONT-HG002")
        chunk = {"chrom": "chr_t", "start": 1, "end": 6000, "ploidy": "diploid"}
        lines = call_indel_chunk(state, bam, fasta, chunk, cfg)
        assert lines, "no indel calls produced"
        path = write_indel_vcf(cfg, ["chr_t"], [lines], str(tmp_path))
        recs = list(VcfReader(path))
        assert recs

        def matches(rec, p, kind, val):
            if abs(rec.pos - (p + 1)) > 3:
                return False
            for alt in rec.alt.split(","):
                d = len(alt) - len(rec.ref)
                if kind == "ins" and d == len(val):
                    return True
                if kind == "del" and d == -val:
                    return True
            return False

        found = {}
        for p, kind, val, gt in indels:
            found[(p, kind)] = any(matches(r, p, kind, val) for r in recs)
        missing = [k for k, v in found.items() if not v]
        assert len(missing) <= 1, (missing, [(r.pos, r.ref, r.alt,
                                              r.sample_field("GT")) for r in recs])


class TestTwoPhaseDecode:
    """The deferred (counts-free, events-at-anchors-only) indel decode
    must be indistinguishable from the full decode (engine.
    indel_deferred_decode + ncio_emit_qpos vs decode_reads)."""

    def test_batches_identical(self, indel_fixture):
        (fasta_p, bam_p, ref_seq, _), indels = indel_fixture
        from nanocaller_tpu.io.fasta import FastaFile

        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        kw = dict(seq_type="ont", mincov=4, maxcov=160, ins_t=0.4,
                  del_t=0.6, win_size=40, small_win_size=4)
        chunk = {"chrom": "chr_t", "start": 1, "end": 6000,
                 "ploidy": "diploid"}
        rw = decode_reads(bam, "chr_t", 0, 6000, keep_seq=True)
        full = get_indel_candidates(bam, fasta, chunk, rw=rw, **kw)
        twophase = get_indel_candidates(bam, fasta, chunk, **kw)
        assert len(full) > 0
        assert list(full.pos) == list(twophase.pos)
        assert full.alleles == twophase.alleles
        assert full.phase == twophase.phase
        for a, b in ((full.x0, twophase.x0), (full.x1, twophase.x1),
                     (full.x2, twophase.x2)):
            assert np.array_equal(a, b)

    def test_qpos_or_next_semantics(self, indel_fixture):
        """Pseudo-events must reproduce query_position_or_next exactly,
        including columns inside deletion spans (qpos of the first
        aligned base after the deletion) and the code=-1 convention for
        non-aligned columns."""
        (fasta_p, bam_p, ref_seq, _), indels = indel_fixture
        from nanocaller_tpu.pileup.engine import indel_deferred_decode
        from nanocaller_tpu.pileup.indel_features import _ColumnView

        bam = BamReader(bam_p)
        rw_full = decode_reads(bam, "chr_t", 0, 6000, keep_seq=True)
        # probe columns: inside/adjacent to the planted 6 bp deletion at
        # 1500, at the insertion anchors, plus ordinary columns
        cols = sorted({1498, 1499, 1500, 1501, 1503, 1505, 1506,
                       2999, 3000, 4499, 4500, 123, 5876})
        deferred = indel_deferred_decode(bam, "chr_t", 0, 6000)
        assert deferred is not None, "native two-phase path unavailable"
        rw_two = deferred.finish_events(cols)
        assert list(rw_two.qnames) == list(rw_full.qnames)
        cv_full = _ColumnView(rw_full)
        cv_two = _ColumnView(rw_two)
        for col in cols:
            assert cv_full.reads_at(col) == cv_two.reads_at(col), col
            assert cv_full.signature_groups(col) == \
                cv_two.signature_groups(col), col


class TestRtgDecompose:
    """rtg vcfdecompose default-mode corpus (VERDICT r1 item 7).

    The reference pipes indel records through `rtg vcfdecompose | rtg
    vcffilter --non-snps-only` with NO --break-mnps/--break-indels
    (indelCaller.py:391). Default rtg splits the REF/ALT alignment only
    at reference-match anchors: MNPs stay whole (and survive the
    non-SNP filter), mismatches abutting indels stay one complex
    record, and split records carry ORP/ORL provenance INFO."""

    def test_mnp_passthrough_untouched(self):
        rec = VcfRecord("c1", 50, "AC", "GT", "40", "PASS",
                        format_="GT:GQ", samples=["1/1:30"])
        out = decompose_record(rec)
        assert len(out) == 1 and out[0] is rec  # verbatim, no ORP
        assert is_non_snp(out[0])  # MNP survives --non-snps-only

    def test_embedded_mnp_extracted_not_split(self):
        # T [AC>GT] GA — the MNP must come out as ONE record, placed and
        # annotated, not two SNPs (which the filter would then drop)
        rec = VcfRecord("c1", 100, "TACGA", "TGTGA", "40", "PASS",
                        format_="GT:GQ", samples=["1/1:30"])
        out = decompose_record(rec)
        assert len(out) == 1
        r = out[0]
        assert (r.pos, r.ref, r.alt) == (101, "AC", "GT")
        assert "ORP=100" in r.info and "ORL=5" in r.info
        assert is_non_snp(r)

    def test_isolated_snps_split_and_filtered(self):
        # T [A>G] C [G>T] A — two isolated SNPs: split apart, then both
        # removed by the non-SNP filter
        rec = VcfRecord("c1", 10, "TACGA", "TGCTA", "40", "PASS",
                        format_="GT:GQ", samples=["0|1:30"])
        out = decompose_record(rec)
        assert [(r.pos, r.ref, r.alt) for r in out] == \
            [(11, "A", "G"), (13, "G", "T")]
        assert all(r.sample_field("GT") == "0|1" for r in out)
        assert [r for r in out if is_non_snp(r)] == []

    def test_mismatch_abutting_insertion_stays_complex(self):
        # AAA [C>TTT] GGG — every optimal alignment leaves the X and the
        # I adjacent (no match anchor between them), so rtg default
        # emits ONE complex record, not an SNP + insertion pair
        rec = VcfRecord("c1", 20, "AAACGGG", "AAATTTGGG", "40", "PASS",
                        format_="GT:GQ", samples=["1/1:30"])
        out = decompose_record(rec)
        assert len(out) == 1
        r = out[0]
        assert (r.pos, r.ref, r.alt) == (23, "C", "TTT")
        assert is_non_snp(r)
        assert "ORP=20" in r.info and "ORL=7" in r.info

    def test_pure_indel_passthrough(self):
        rec = VcfRecord("c1", 70, "A", "ATT", "40", "PASS", info=".",
                        format_="GT:GQ", samples=["0|1:30"])
        out = decompose_record(rec)
        assert len(out) == 1 and out[0] is rec
        assert out[0].info == "."

    def test_trim_to_minimal_indel(self):
        # padded representation GATT>GA: decomposes to the minimal
        # deletion, anchored per VCF convention, with provenance
        rec = VcfRecord("c1", 30, "GATT", "GA", "40", "PASS",
                        format_="GT:GQ", samples=["1/1:30"])
        out = decompose_record(rec)
        assert len(out) == 1
        r = out[0]
        assert len(r.ref) - len(r.alt) == 2
        assert "ORP=30" in r.info and "ORL=4" in r.info

    def test_multiallelic_shared_prefix_deletions(self):
        # ACCCT with alt1 = 1C deleted, alt2 = 2C deleted, 1|2
        rec = VcfRecord("c1", 200, "ACCCT", "ACCT,ACT", "50", "PASS",
                        format_="GT:GQ:PS", samples=["1|2:30:177"])
        out = decompose_record(rec)
        assert len(out) == 2
        by_gt = {r.sample_field("GT"): r for r in out}
        assert set(by_gt) == {"1|0", "0|1"}
        d1 = by_gt["1|0"]
        d2 = by_gt["0|1"]
        assert len(d1.ref) - len(d1.alt) == 1
        assert len(d2.ref) - len(d2.alt) == 2
        assert all(r.sample_field("PS") == "177" for r in out)

    def test_multiallelic_shared_primitive_is_homozygous(self):
        # both alts carry the same insertion; alt2 adds a downstream SNP
        rec = VcfRecord("c1", 300, "ATTTGC", "AGGTTTGC,AGGTTTGT", "50",
                        "PASS", format_="GT:GQ", samples=["1|2:30"])
        out = decompose_record(rec)
        gts = {(r.pos, r.ref, r.alt): r.sample_field("GT") for r in out}
        ins = [(k, v) for k, v in gts.items() if len(k[2]) > len(k[1])]
        assert len(ins) == 1 and ins[0][1] == "1|1", gts
        snp = [(k, v) for k, v in gts.items()
               if len(k[1]) == 1 and len(k[2]) == 1]
        assert len(snp) == 1 and snp[0][1] == "0|1", gts

    def test_insertion_at_record_start(self):
        rec = VcfRecord("c1", 5, "CAG", "TTCAG", "40", "PASS",
                        format_="GT:GQ", samples=["1/1:30"])
        out = decompose_record(rec)
        assert len(out) == 1
        r = out[0]
        assert len(r.alt) - len(r.ref) == 2

    def test_stream_keeps_mnps_drops_snps(self):
        recs = [
            VcfRecord("c1", 10, "TACGA", "TGCTA", "40", "PASS",
                      format_="GT:GQ", samples=["1/1:30"]),  # 2 SNPs
            VcfRecord("c1", 100, "TACGA", "TGTGA", "40", "PASS",
                      format_="GT:GQ", samples=["1/1:30"]),  # MNP
            VcfRecord("c1", 70, "A", "ATT", "40", "PASS",
                      format_="GT:GQ", samples=["0|1:30"]),  # ins
        ]
        from nanocaller_tpu.indel_caller import decompose_and_filter
        out = decompose_and_filter(recs, contig_rank={"c1": 0})
        assert [(r.pos, r.ref, r.alt) for r in out] == \
            [(70, "A", "ATT"), (101, "AC", "GT")]
