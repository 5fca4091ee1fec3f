import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from nanocaller_tpu.io.vcf import VcfReader, VcfRecord, VcfWriter
from nanocaller_tpu.runtime.distributed import merge_host_shards, shard_chunks
from nanocaller_tpu.runtime.metrics import Metrics

from fixtures import make_fixture

HDR = ["##fileformat=VCFv4.2", "##contig=<ID=c1>",
       '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
       "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]


def write_vcf(path, rows):
    with VcfWriter(path, HDR) as w:
        for pos, ref, alt, qual, gt in rows:
            w.write(VcfRecord("c1", pos, ref, alt, str(qual), "PASS",
                              format_="GT", samples=[gt]))
    return path


class TestVcfCompare:
    def test_metrics(self, tmp_path):
        import vcf_compare

        truth = write_vcf(str(tmp_path / "t.vcf.gz"), [
            (100, "A", "T", 50, "0/1"), (200, "C", "G", 50, "1/1"),
            (300, "G", "A", 50, "0/1")])
        calls = write_vcf(str(tmp_path / "c.vcf.gz"), [
            (100, "A", "T", 30, "0/1"),      # TP
            (200, "C", "G", 20, "0/1"),      # genotype mismatch → FP
            (400, "T", "C", 10, "0/1")])     # FP
        best = vcf_compare.main(["--calls", calls, "--truth", truth, "--json"])
        assert best["tp"] == 1 and best["fn"] == 2

    def test_type_filter(self, tmp_path):
        import vcf_compare

        truth = write_vcf(str(tmp_path / "t2.vcf.gz"), [
            (100, "A", "AT", 50, "0/1")])
        calls = write_vcf(str(tmp_path / "c2.vcf.gz"), [
            (100, "A", "AT", 30, "0/1"), (150, "G", "C", 30, "0/1")])
        best = vcf_compare.main(["--calls", calls, "--truth", truth,
                                 "--type", "indel", "--json"])
        assert best["tp"] == 1 and best["fp"] == 0


class TestHaplotypeAwareCompare:
    """--ref mode: representation differences must match like rtg
    vcfeval (SURVEY.md §2.3 N7 — rtg stays evaluation-only in the
    reference; this is the in-repo equivalent)."""

    REF = ("ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
           "TTTTCCCCGGGGAAAATTTTCCCCGGGGAAAATTTTCCCC")  # 80 bp, contig c1

    def _ref_fa(self, tmp_path):
        from nanocaller_tpu.io.fasta import write_fasta

        p = str(tmp_path / "ref.fa")
        write_fasta(p, {"c1": self.REF})
        return p

    def _run(self, tmp_path, truth_rows, call_rows, ref=True, vtype="all"):
        import vcf_compare

        truth = write_vcf(str(tmp_path / "ht.vcf.gz"), truth_rows)
        calls = write_vcf(str(tmp_path / "hc.vcf.gz"), call_rows)
        args = ["--calls", calls, "--truth", truth, "--json"]
        if ref:
            args += ["--ref", self._ref_fa(tmp_path)]
        return vcf_compare.main(args + ["--type", vtype])

    def test_mnp_vs_two_snps(self, tmp_path):
        # truth: phased MNP AC>TG at pos 9-10; calls: two adjacent SNPs
        truth = [(9, "AC", "TG", 50, "1|0")]
        calls = [(9, "A", "T", 30, "0/1"), (10, "C", "G", 28, "0/1")]
        best = self._run(tmp_path, truth, calls)
        assert best["tp"] == 2 and best["fn"] == 0 and best["fp"] == 0
        # without --ref these are mismatches
        best = self._run(tmp_path, truth, calls, ref=False)
        assert best["tp"] == 0

    def test_joined_vs_split_requires_same_haplotype(self, tmp_path):
        # two het SNPs on OPPOSITE haplotypes can't reproduce a hom MNP
        truth = [(9, "AC", "TG", 50, "1|1")]
        calls = [(9, "A", "T", 30, "0/1"), (10, "C", "G", 28, "0/1")]
        best = self._run(tmp_path, truth, calls)
        assert best["tp"] == 0

    def test_indel_anchor_shift(self, tmp_path):
        # REF ...pos40 TTTTCCCC...: truth deletes two T's with a left
        # anchor, calls delete the homopolymer's other two T's
        truth = [(41, "TTT", "T", 50, "0/1")]
        calls = [(43, "TTC", "C", 30, "0/1")]
        best = self._run(tmp_path, truth, calls)
        assert best["tp"] == 1 and best["fn"] == 0

    def test_multiallelic_1_2_vs_two_records(self, tmp_path):
        truth = [(21, "G", "A,C", 50, "1|2")]
        calls = [(21, "G", "A", 30, "0|1"), (21, "G", "C", 25, "1|0")]
        best = self._run(tmp_path, truth, calls)
        assert best["tp"] == 2 and best["fn"] == 0

    def test_zygosity_mismatch_not_rescued(self, tmp_path):
        truth = [(9, "A", "T", 50, "1/1")]
        calls = [(9, "A", "T", 30, "0/1")]
        best = self._run(tmp_path, truth, calls)
        assert best["tp"] == 0 and best["fn"] == 1

    def test_support_qual_from_weakest_call(self, tmp_path):
        # recall at a threshold above the weakest supporting call drops
        truth = [(9, "AC", "TG", 50, "1|0")]
        calls = [(9, "A", "T", 30, "0/1"), (10, "C", "G", 5, "0/1")]
        import vcf_compare

        t = write_vcf(str(tmp_path / "sq_t.vcf.gz"), truth)
        c = write_vcf(str(tmp_path / "sq_c.vcf.gz"), calls)
        cv = vcf_compare.load_variants(c)
        tv = vcf_compare.load_variants(t)
        from nanocaller_tpu.io.fasta import FastaFile

        vcf_compare.match_variants(cv, tv, FastaFile(self._ref_fa(tmp_path)))
        assert tv[0].support == 5
        rows, _ = vcf_compare.evaluate(cv, tv, thresholds=[0.0, 10.0])
        assert rows[0]["fn"] == 0 and rows[1]["fn"] == 1


class TestEnsemble:
    def test_majority_vote(self, tmp_path):
        import ensemble

        a = write_vcf(str(tmp_path / "a.vcf.gz"),
                      [(100, "A", "T", 40, "0/1"), (200, "C", "G", 10, "1/1")])
        b = write_vcf(str(tmp_path / "b.vcf.gz"),
                      [(100, "A", "T", 35, "0/1"), (300, "G", "A", 20, "0/1")])
        c = write_vcf(str(tmp_path / "c.vcf.gz"),
                      [(100, "A", "T", 99, "0/1"), (200, "C", "G", 30, "1/1")])
        out = str(tmp_path / "ens.vcf.gz")
        ensemble.main([a, b, c, "--out", out])
        recs = {r.pos: r for r in VcfReader(out)}
        assert 100 in recs and recs[100].sample_field("GT") == "0/1"
        assert 200 in recs and recs[200].sample_field("GT") == "1/1"
        assert 300 not in recs  # only one vote

    def test_snp_readnames(self, tmp_path):
        import snp_readnames

        fasta_p, bam_p, ref_seq, snps = make_fixture(tmp_path, depth=20, L=4000)
        vcf_p = str(tmp_path / "v.vcf.gz")
        het_snps = [s for s in snps if s[2] != "hom"][:2]
        rows = [(p + 1, ref_seq[p], a, 50, "0/1") for p, a, g in het_snps]
        hdr = [h.replace("c1", "chr_t") for h in HDR]
        with VcfWriter(vcf_p, hdr) as w:
            for pos, ref, alt, qual, gt in rows:
                w.write(VcfRecord("chr_t", pos, ref, alt, str(qual), "PASS",
                                  format_="GT", samples=[gt]))
        out = str(tmp_path / "names.txt")
        snp_readnames.main(["--vcf", vcf_p, "--bam", bam_p, "--output", out])
        lines = open(out).read().strip().split("\n")
        assert len(lines) == 2
        f = lines[0].split("\t")
        assert f[0] == "chr_t"
        # both allele columns have reads
        assert len(f[2].split(":")[1].split(",")) > 3
        assert len(f[3].split(":")[1].split(",")) > 3


class TestDistributedHelpers:
    def test_shard_chunks(self):
        chunks = [{"chrom": "c", "start": i, "end": i + 1} for i in range(10)]
        parts = [shard_chunks(chunks, p, 3) for p in range(3)]
        assert sum(len(p) for p in parts) == 10
        seen = [c["start"] for part in parts for c in part]
        assert sorted(seen) == list(range(10))

    def test_shard_regions_splits_single_contig(self):
        from nanocaller_tpu.runtime.distributed import shard_regions

        regions = [("chr1", 1, 2_000_000, "diploid")]
        parts = [shard_regions(regions, p, 2) for p in range(2)]
        assert all(len(p) >= 1 for p in parts), \
            "every host must get work on a single-contig genome"
        covered = sorted(r for part in parts for r in part)
        # pieces tile the original region exactly
        assert covered[0][1] == 1 and covered[-1][2] == 2_000_000
        for a, b in zip(covered, covered[1:]):
            assert b[1] == a[2] + 1
        # enough regions → contig-granular round-robin is preserved
        many = [("c%d" % i, 1, 100, "diploid") for i in range(6)]
        assert shard_regions(many, 0, 3) == [many[0], many[3]]

    def test_concat_same_position_across_streams(self, tmp_path):
        """heapq tie-break: equal (contig,pos) keys across shards must
        not fall through to comparing VcfRecord objects."""
        from nanocaller_tpu.io.vcf import concat

        p1 = write_vcf(str(tmp_path / "s0.vcf.gz"), [(10, "A", "T", 5, "0/1")])
        p2 = write_vcf(str(tmp_path / "s1.vcf.gz"), [(10, "A", "G", 6, "0/1")])
        out = concat([p1, p2], str(tmp_path / "tie.vcf.gz"))
        assert [r.pos for r in VcfReader(out)] == [10, 10]

    def test_merge_host_shards(self, tmp_path):
        p1 = write_vcf(str(tmp_path / "h0.vcf.gz"), [(10, "A", "T", 5, "0/1")])
        p2 = write_vcf(str(tmp_path / "h1.vcf.gz"), [(5, "C", "G", 5, "0/1")])
        out = merge_host_shards([p1, p2, str(tmp_path / "missing.vcf.gz")],
                                str(tmp_path / "m.vcf.gz"))
        assert [r.pos for r in VcfReader(out)] == [5, 10]

    def test_metrics(self, tmp_path):
        m = Metrics()
        with m.timer("stage_a"):
            pass
        m.count("candidates", 5)
        d = m.as_dict()
        assert "stage_a" in d["timers_s"] and d["counts"]["candidates"] == 5
        m.dump(str(tmp_path / "metrics.json"))


class TestHpSlips:
    """Homopolymer slip error model (sim._inject_hp_slips) — the ONT
    failure mode behind the reference's published indel split
    (docs/ONT_Case_Study.md:249-263)."""

    def _consume(self, cigar):
        q = sum(l for op, l in cigar if op in ("M", "I"))
        r = sum(l for op, l in cigar if op in ("M", "D"))
        return q, r

    def test_alignment_consistency_and_length_dependence(self):
        import numpy as np
        from nanocaller_tpu.sim import _inject_hp_slips, random_seq

        rng = np.random.default_rng(0)
        # sequence with known runs of varying length embedded
        parts, runs = [], []
        cursor = 0
        for rlen in (4, 6, 8, 10, 12, 14) * 30:
            filler = random_seq(rng, 20)
            parts.append(filler)
            cursor += len(filler)
            base = "ACGT"[int(rng.integers(0, 4))]
            # avoid accidental run extension across the boundary
            if parts[-1][-1] == base:
                parts[-1] = parts[-1][:-1] + "ACGT"[("ACGT".index(base)+1) % 4]
            parts.append(base * rlen)
            runs.append((cursor, rlen))
            cursor += rlen
        seq = "".join(parts)
        cigar = [("M", len(seq))]
        slipped = {r: 0 for r in (4, 6, 8, 10, 12, 14)}
        trials = 40
        for t in range(trials):
            s2, c2 = _inject_hp_slips(np.random.default_rng(t), seq, cigar,
                                      rate=0.05)
            q, r = self._consume(c2)
            assert q == len(s2)
            assert r == len(seq)  # reference span preserved
            # count slips per run length via cigar walk
            rpos = 0
            for op, l in c2:
                if op in ("I", "D"):
                    for start, rlen in runs:
                        if start <= rpos <= start + rlen:
                            slipped[rlen] += 1
                            break
                if op in ("M", "D"):
                    rpos += l
        # longer runs must slip more (monotone trend over the extremes)
        assert slipped[14] > slipped[4], slipped
        assert slipped[10] > slipped[4], slipped

    def test_zero_rate_identity(self):
        import numpy as np
        from nanocaller_tpu.sim import _inject_hp_slips

        seq = "AAAAATTTTTGGGGG"
        s2, c2 = _inject_hp_slips(np.random.default_rng(0), seq,
                                  [("M", len(seq))], rate=0.0)
        assert s2 == seq and c2 == [("M", len(seq))]


class TestHpProfileSim:
    def test_hp_profile_outputs(self, tmp_path):
        import numpy as np
        from simulate import main as sim_main

        out = str(tmp_path / "sim")
        fasta_p, bam_p, vcf_p = sim_main([
            "--output", out, "--length", "120000", "--depth", "20",
            "--error_rate", "0.02", "--hp_profile", "--seed", "3"])
        # BEDs partition the contig
        import os
        spans = []
        for name in ("hp_regions.bed", "nonhp_regions.bed"):
            with open(os.path.join(out, name)) as f:
                for line in f:
                    c, a, b = line.split()
                    spans.append((int(a), int(b)))
        spans.sort()
        assert spans[0][0] == 0 and spans[-1][1] == 120000
        for (a1, b1), (a2, b2) in zip(spans[:-1], spans[1:]):
            assert b1 == a2, (b1, a2)
        # truth VCF has hp-situated indels: at least one ins/del whose
        # REF/ALT extension matches the local homopolymer base
        from nanocaller_tpu.io.vcf import VcfReader
        from nanocaller_tpu.io.fasta import FastaFile
        fa = FastaFile(fasta_p)
        n_hp_indel = 0
        for rec in VcfReader(vcf_p):
            if len(rec.ref) == len(rec.alt):
                continue
            ctx = fa.fetch("chrSim", rec.pos - 1, rec.pos + 6)
            longer = rec.ref if len(rec.ref) > len(rec.alt) else rec.alt
            if len(set(longer[1:])) == 1 and ctx[1] == longer[1]:
                n_hp_indel += 1
        assert n_hp_indel >= 3, n_hp_indel
