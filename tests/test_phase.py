import numpy as np
import pytest

from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.vcf import VcfRecord
from nanocaller_tpu.phase.mec import (
    haplotag_reads,
    phase_contig,
    phase_sites,
)
from nanocaller_tpu.pileup.engine import decode_reads

from fixtures import make_fixture


def make_het_fixture(tmp_path, L=8000, spacing=400, depth=30, read_len=1200,
                     seed=5, error_rate=0.0):
    from fixtures import random_seq, make_diploid_readset, write_bam
    from nanocaller_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(seed)
    ref_seq = random_seq(rng, L)
    snps = []
    truth = {}
    for i, pos in enumerate(range(500, L - 500, spacing)):
        ref_b = ref_seq[pos]
        alt = "ACGT"[("ACGT".index(ref_b) + 1) % 4]
        gt = "het1" if i % 2 == 0 else "het2"
        snps.append((pos, alt, gt))
        truth[pos] = gt
    reads = make_diploid_readset(rng, ref_seq, snps=snps, depth=depth,
                                 read_len=read_len, error_rate=error_rate)
    fasta_path = str(tmp_path / "ref.fa")
    write_fasta(fasta_path, {"chr_t": ref_seq})
    bam_path = str(tmp_path / "reads.bam")
    write_bam(bam_path, "chr_t", L, reads)
    return fasta_path, bam_path, ref_seq, snps, truth, reads


class TestPhasing:
    def test_single_block_correct_phase(self, tmp_path):
        fasta_p, bam_p, ref_seq, snps, truth, reads = make_het_fixture(tmp_path)
        bam = BamReader(bam_p)
        rw = decode_reads(bam, "chr_t", 0, 8000, keep_seq=False)
        pos = np.array([p for p, a, g in snps], np.int64)
        refc = np.array(["AGTC".index(ref_seq[p]) for p in pos], np.int8)
        altc = np.array(["AGTC".index(a) for p, a, g in snps], np.int8)
        res = phase_sites(rw, pos, refc, altc)
        # reads are long enough to chain all sites → one block
        assert res.n_blocks == 1
        assert (res.block_ps >= 0).all()
        assert res.block_ps[0] == pos[0] + 1
        # phase consistency: hap_allele must match truth up to global flip
        want = np.array([1 if truth[int(p)] == "het1" else 0 for p in pos])
        agree = (res.hap_allele == want).mean()
        assert agree in (0.0, 1.0), agree  # perfectly consistent either way
        # error-free reads → zero MEC cost
        assert res.mec_cost == 0
        # reads assigned to haplotypes by simulated origin
        by_name = {q: hp for q, hp in zip(rw.qnames, res.read_hp)}
        hap_of = {name: hap for name, s, seq, cig, hap in reads}
        # map result hap → sim hap via majority, then check consistency
        votes = {}
        n_checked = 0
        for q, hp in by_name.items():
            if hp and q in hap_of:
                votes.setdefault((hp, hap_of[q]), 0)
                votes[(hp, hap_of[q])] += 1
                n_checked += 1
        # all reads covering ≥1 het must be assigned
        assert n_checked > 0.8 * len(reads)
        flip = votes.get((1, 1), 0) + votes.get((2, 2), 0)
        noflip = votes.get((1, 2), 0) + votes.get((2, 1), 0)
        assert min(flip, noflip) == 0  # no mixing

    def test_noise_tolerance(self, tmp_path):
        fasta_p, bam_p, ref_seq, snps, truth, reads = make_het_fixture(
            tmp_path, error_rate=0.05, seed=8)
        bam = BamReader(bam_p)
        rw = decode_reads(bam, "chr_t", 0, 8000)
        pos = np.array([p for p, a, g in snps], np.int64)
        refc = np.array(["AGTC".index(ref_seq[p]) for p in pos], np.int8)
        altc = np.array(["AGTC".index(a) for p, a, g in snps], np.int8)
        res = phase_sites(rw, pos, refc, altc)
        want = np.array([1 if truth[int(p)] == "het1" else 0 for p in pos])
        agree = (res.hap_allele == want).mean()
        assert agree >= 0.9 or agree <= 0.1, agree

    def test_phase_contig_and_map(self, tmp_path):
        fasta_p, bam_p, ref_seq, snps, truth, reads = make_het_fixture(tmp_path)
        bam = BamReader(bam_p)
        rw = decode_reads(bam, "chr_t", 0, 8000)
        recs = []
        base_map = {"A": 0, "G": 1, "T": 2, "C": 3}
        for p, a, g in snps:
            recs.append(VcfRecord("chr_t", p + 1, ref_seq[p], a, "50.0",
                                  "PASS", format_="GT:DP", samples=["0/1:30"]))
        result, phase_map = phase_contig(recs, rw)
        assert len(phase_map) == len(snps)
        for p, a, g in snps:
            gt, ps = phase_map[p + 1]
            assert gt in ("0|1", "1|0")
            assert ps == snps[0][0] + 1
        tags = haplotag_reads(rw, result)
        assert len(tags) > 0.8 * len(reads)
        for q, (hp, ps) in tags.items():
            assert hp in (1, 2) and ps == snps[0][0] + 1

    def test_disconnected_blocks(self, tmp_path):
        # two far-apart het clusters with short reads → ≥2 phase blocks
        fasta_p, bam_p, ref_seq, snps, truth, reads = make_het_fixture(
            tmp_path, L=20000, spacing=2500, read_len=600, seed=3)
        bam = BamReader(bam_p)
        rw = decode_reads(bam, "chr_t", 0, 20000)
        pos = np.array([p for p, a, g in snps], np.int64)
        refc = np.array(["AGTC".index(ref_seq[p]) for p in pos], np.int8)
        altc = np.array(["AGTC".index(a) for p, a, g in snps], np.int8)
        res = phase_sites(rw, pos, refc, altc)
        # reads (600bp) cannot span 2500bp gaps → all sites unphased singletons
        assert res.n_blocks == 0
        assert (res.block_ps == -1).all()


class TestDistrustGenotypes:
    """--enable_whatshap equivalent: whatshap --distrust-genotypes
    --include-homozygous (indelCaller.py:228) as a post-MEC regenotyping
    pass."""

    def _setup(self, tmp_path):
        fasta_p, bam_p, ref_seq, snps, truth, reads = make_het_fixture(
            tmp_path, error_rate=0.01, seed=9)
        bam = BamReader(bam_p)
        rw = decode_reads(bam, "chr_t", 0, 8000)
        return ref_seq, snps, rw

    def _recs(self, ref_seq, snps, gts):
        return [VcfRecord("chr_t", p + 1, ref_seq[p], a, "50.0", "PASS",
                          format_="GT:DP", samples=["%s:30" % gts.get(p, "0/1")])
                for p, a, g in snps]

    def test_hom_alt_opened_to_phased_het(self, tmp_path):
        # one true het miscalled as 1/1 → distrust pass restores a
        # phased het with the block's PS
        ref_seq, snps, rw = self._setup(tmp_path)
        wrong = snps[4][0]
        recs = self._recs(ref_seq, snps, {wrong: "1/1"})
        _, plain = phase_contig(recs, rw)
        assert wrong + 1 not in plain  # homs are not phased by default
        _, fixed = phase_contig(recs, rw, distrust=True)
        gt, ps = fixed[wrong + 1]
        assert gt in ("0|1", "1|0")
        assert ps == snps[0][0] + 1

    def test_false_het_collapsed_to_hom(self, tmp_path):
        # a position where every read carries alt (true hom) but the
        # record claims het → collapsed to 1/1 (unphased)
        ref_seq, snps, rw = self._setup(tmp_path)
        # plant: treat an existing hom-like site by making a record for a
        # position with no alt support at all → collapses to 0/0
        quiet = snps[2][0] + 150  # ref-only position
        alt = "ACGT"[("ACGT".index(ref_seq[quiet]) + 1) % 4]
        recs = self._recs(ref_seq, snps, {})
        recs.append(VcfRecord("chr_t", quiet + 1, ref_seq[quiet], alt,
                              "50.0", "PASS", format_="GT:DP",
                              samples=["0/1:30"]))
        _, fixed = phase_contig(recs, rw, distrust=True)
        assert fixed[quiet + 1] == "0/0"
        # true hets stay phased
        for p, a, g in snps:
            gt, ps = fixed[p + 1]
            assert gt in ("0|1", "1|0")

    def test_default_gq_cost(self, tmp_path):
        # whatshap prices every genotype change at its constant
        # --default-gq (30 phred) because NanoCaller's VCF carries no
        # GL/PL (snpCaller.py:135-197) — the record QUAL must NOT
        # matter. The miscalled hom flips regardless of QUAL (~30x
        # fixture: advantage ≈ 15 obs × 9.5 phred ≈ 143 > 30) but
        # survives when default_gq is raised above the advantage.
        ref_seq, snps, rw = self._setup(tmp_path)
        wrong = snps[4][0]

        def recs_with_qual(q):
            out = []
            for p, a, g in snps:
                gt = "1/1" if p == wrong else "0/1"
                out.append(VcfRecord("chr_t", p + 1, ref_seq[p], a, q,
                                     "PASS", format_="GT:DP",
                                     samples=["%s:30" % gt]))
            return out

        for q in ("50.0", "900.0", "."):  # QUAL is irrelevant to the cost
            _, fixed = phase_contig(recs_with_qual(q), rw, distrust=True)
            gt, _ps = fixed[wrong + 1]
            assert gt in ("0|1", "1|0")
        _, kept = phase_contig(recs_with_qual("50.0"), rw, distrust=True,
                               default_gq=500.0)
        assert wrong + 1 not in kept

    def test_write_phased_vcf_drops_homref(self, tmp_path):
        # GT collapsed to 0/0 must vanish from the phased VCF
        # (bcftools view -e 'GT="0\0"' equivalent, indelCaller.py:241)
        from nanocaller_tpu.io.vcf import VcfReader
        from nanocaller_tpu.phase.mec import write_phased_vcf

        ref_seq, snps, rw = self._setup(tmp_path)
        recs = self._recs(ref_seq, snps, {})
        phase_map = {snps[0][0] + 1: "0/0", snps[1][0] + 1: "1/1",
                     snps[2][0] + 1: ("1|0", 123)}

        class _Src:
            header_lines = ["##fileformat=VCFv4.2",
                            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                            "\tFORMAT\tS"]

            def __iter__(self):
                return iter(recs)

        out = str(tmp_path / "p.vcf.gz")
        write_phased_vcf(_Src(), out, phase_map)
        got = {r.pos: r.sample_field("GT") for r in VcfReader(out)}
        assert snps[0][0] + 1 not in got          # 0/0 dropped
        assert got[snps[1][0] + 1] == "1/1"       # regenotyped hom kept
        assert got[snps[2][0] + 1] == "1|0"       # phased het rewritten
        assert len(got) == len(snps) - 1
