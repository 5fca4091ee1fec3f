"""Full-pipeline (all-mode) end-to-end tests through the CLI surface."""

import os

import numpy as np
import pytest

from nanocaller_tpu.cli import config_from_args, main
from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import write_fasta
from nanocaller_tpu.io.vcf import VcfReader

from fixtures import make_diploid_readset, make_fixture, random_seq, write_bam


@pytest.fixture(scope="module")
def full_fixture(tmp_path_factory):
    """Untagged BAM with dense alternating hets + planted indels and 2%
    read error: the pipeline must call SNPs, phase them itself, and feed
    haplotype assignments to the indel stage in memory."""
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(12)
    L = 8000
    ref_seq = random_seq(rng, L)
    snps = []
    for i, pos in enumerate(range(500, L - 500, 350)):
        rb = ref_seq[pos]
        alt = "ACGT"[("ACGT".index(rb) + 1) % 4]
        snps.append((pos, alt, "het1" if i % 2 == 0 else "het2"))
    indels = [(2210, "del", 6, "het1"), (4120, "ins", "TTTTT", "hom")]
    reads = make_diploid_readset(rng, ref_seq, snps=snps, indels=indels,
                                 depth=40, read_len=1400, error_rate=0.02)
    fasta_p = str(tmp / "ref.fa")
    write_fasta(fasta_p, {"chr_t": ref_seq})
    bam_p = str(tmp / "reads.bam")
    write_bam(bam_p, "chr_t", L, reads)
    return fasta_p, bam_p, ref_seq, snps, indels


class TestPresetSemantics:
    def test_preset_applies_only_unset(self, full_fixture):
        fasta_p, bam_p, *_ = full_fixture
        cfg = config_from_args([
            "--bam", bam_p, "--ref", fasta_p, "--preset", "ccs",
            "--ins_threshold", "0.9"])
        assert cfg.sequencing == "pacbio"
        assert cfg.snp_model == "CCS-HG002"
        assert cfg.ins_threshold == 0.9  # explicitly set wins over preset
        assert cfg.del_threshold == 0.4  # from preset
        assert cfg.enable_whatshap is True

    def test_short_flag_alias(self, full_fixture):
        fasta_p, bam_p, *_ = full_fixture
        cfg = config_from_args([
            "--bam", bam_p, "--ref", fasta_p, "--preset", "clr",
            "--nbr_t", "0.2,0.8"])
        assert cfg.neighbor_threshold == "0.2,0.8"
        assert cfg.win_size == 10  # clr preset


class TestAllMode:
    def test_full_pipeline(self, full_fixture, tmp_path):
        fasta_p, bam_p, ref_seq, snps, indels = full_fixture
        out = str(tmp_path / "out")
        outputs = main([
            "--bam", bam_p, "--ref", fasta_p, "--mode", "all",
            "--output", out, "--prefix", "run1", "--sample", "HGTEST",
            "--phase_qual_score", "4"])
        # output contract
        assert outputs["snps"].endswith("run1.snps.vcf.gz")
        assert outputs["phased_snps"].endswith("run1.snps.phased.vcf.gz")
        assert outputs["indels"].endswith("run1.indels.vcf.gz")
        assert outputs["final"].endswith("run1.vcf.gz")
        for path in outputs.values():
            assert os.path.exists(path), path
            assert os.path.exists(path + ".csi"), path
        assert os.path.exists(os.path.join(out, "args"))

        # phased SNPs: hets phased with PS
        phased = list(VcfReader(outputs["phased_snps"]))
        het_gts = [r for r in phased
                   if r.sample_field("GT") in ("0|1", "1|0")]
        assert len(het_gts) >= 6
        ps_vals = {r.sample_field("PS") for r in het_gts}
        assert all(v not in (None, ".") for v in ps_vals)

        # indels in the final concat: planted het del + hom ins recovered
        final = list(VcfReader(outputs["final"]))
        indel_recs = [r for r in final
                      if len(r.ref) > 1 or any(len(a) > 1 for a in r.alt.split(","))]
        assert indel_recs, [(r.pos, r.ref, r.alt) for r in final]
        del_hits = [r for r in indel_recs
                    if abs(r.pos - 2211) <= 3
                    and any(len(r.ref) - len(a) == 6 for a in r.alt.split(","))]
        ins_hits = [r for r in indel_recs
                    if abs(r.pos - 4121) <= 3
                    and any(len(a) - len(r.ref) == 5 for a in r.alt.split(","))]
        assert del_hits and ins_hits, [(r.pos, r.ref, r.alt) for r in indel_recs]
        # het deletion phased
        assert del_hits[0].sample_field("GT") in ("1|0", "0|1")

        # phased BAM artifact exists with HP tags
        phase_dir = os.path.join(out, "intermediate_phase_files")
        pbam = os.path.join(phase_dir, "chr_t.phased.bam")
        assert os.path.exists(pbam)
        tagged = [r for r in BamReader(pbam) if "HP" in r.tags]
        assert len(tagged) > 50

    def test_parallel_workers_match_serial(self, tmp_path):
        """--cpu 2 (spawned feature workers + phased-BAM handoff) must
        produce the same records as the serial in-memory path. Uses a
        24kb genome so the chunker actually emits multiple chunks
        (min chunk size is 10kb, utils.py:67-83 parity)."""
        rng = np.random.default_rng(44)
        L = 24000
        ref_seq = random_seq(rng, L)
        snps = []
        for i, pos in enumerate(range(600, L - 600, 380)):
            rb = ref_seq[pos]
            alt = "ACGT"[("ACGT".index(rb) + 1) % 4]
            snps.append((pos, alt, "het1" if i % 2 == 0 else "het2"))
        indels = [(5200, "del", 5, "het2"), (15300, "ins", "ACAC", "hom")]
        reads = make_diploid_readset(rng, ref_seq, snps=snps, indels=indels,
                                     depth=35, read_len=1500, error_rate=0.02)
        fasta_p = str(tmp_path / "ref24.fa")
        write_fasta(fasta_p, {"chr_t": ref_seq})
        bam_p = str(tmp_path / "reads24.bam")
        write_bam(bam_p, "chr_t", L, reads)
        # pin the chunk list (chunk boundaries depend on cpu in the
        # chunk-size policy, so a CLI-level comparison would differ) and
        # vary only the worker count
        from nanocaller_tpu.io.bam import BamReader as BR
        from nanocaller_tpu.io.fasta import FastaFile
        from nanocaller_tpu.runtime import get_chunks, get_regions_list
        from nanocaller_tpu.snp_caller import call_snps

        outs = {}
        for cpu in (1, 3):
            out = str(tmp_path / ("cpu%d" % cpu))
            os.makedirs(out, exist_ok=True)
            cfg = config_from_args(["--bam", bam_p, "--ref", fasta_p,
                                    "--output", out, "--cpu", str(cpu)])
            bam = BR(bam_p)
            fasta = FastaFile(fasta_p)
            regions = get_regions_list(cfg, bam)
            chunks = get_chunks(regions, 4)  # fixed: 4-ish chunks
            assert len(chunks) >= 3
            outs[cpu] = call_snps(cfg, bam, fasta, regions, chunks, out)
        a = [(r.chrom, r.pos, r.ref, r.alt, r.qual, r.samples)
             for r in VcfReader(outs[1])]
        b = [(r.chrom, r.pos, r.ref, r.alt, r.qual, r.samples)
             for r in VcfReader(outs[3])]
        assert len(a) > 10
        assert a == b

    def test_snps_mode_with_phase(self, full_fixture, tmp_path):
        fasta_p, bam_p, *_ = full_fixture
        out = str(tmp_path / "out2")
        outputs = main([
            "--bam", bam_p, "--ref", fasta_p, "--mode", "snps", "--phase",
            "--output", out, "--prefix", "p1", "--phase_qual_score", "4"])
        assert outputs["snps"] and outputs["phased_snps"]
        assert outputs["indels"] is None

    def test_resume_reuses_chunks_and_matches(self, full_fixture, tmp_path):
        """--resume: a rerun over an existing manifest reloads completed
        chunk shards (no recompute) and produces identical outputs."""
        fasta_p, bam_p, *_ = full_fixture
        out = str(tmp_path / "outr")
        args = ["--bam", bam_p, "--ref", fasta_p, "--mode", "all",
                "--output", out, "--prefix", "r", "--phase_qual_score", "4"]
        first = main(args)
        a = [(r.chrom, r.pos, r.ref, r.alt, r.qual, r.samples)
             for r in VcfReader(first["final"])]
        manifest = os.path.join(out, "run_manifest.json")
        assert os.path.exists(manifest)
        import json
        done = json.load(open(manifest))
        assert any(k.startswith("snp:") for k in done)
        assert any(k.startswith("indel:") for k in done)
        # poison the BAM path dependency: resume must NOT need feature gen
        second = main(args + ["--resume"])
        b = [(r.chrom, r.pos, r.ref, r.alt, r.qual, r.samples)
             for r in VcfReader(second["final"])]
        assert a == b
        # metrics dumped
        assert os.path.exists(os.path.join(out, "metrics.json"))

    def test_haploid_genome_mode(self, tmp_path):
        """--haploid_genome: haploid SNP model (×100 Phred scale) and
        haploid indel path (sigmoid)."""
        rng = np.random.default_rng(9)
        L = 6000
        ref_seq = random_seq(rng, L)
        snps = []
        for pos in range(600, L - 600, 800):
            rb = ref_seq[pos]
            snps.append((pos, "ACGT"[("ACGT".index(rb) + 1) % 4], "hom"))
        indels = [(3000, "del", 5, "hom")]
        reads = make_diploid_readset(rng, ref_seq, snps=snps, indels=indels,
                                     depth=30, read_len=900, error_rate=0.02)
        fasta_p = str(tmp_path / "hap.fa")
        write_fasta(fasta_p, {"chrM": ref_seq})
        bam_p = str(tmp_path / "hap.bam")
        write_bam(bam_p, "chrM", L, reads)
        out = str(tmp_path / "outh")
        outputs = main([
            "--bam", bam_p, "--ref", fasta_p, "--mode", "all",
            "--output", out, "--prefix", "h1", "--haploid_genome"])
        # chrM is always haploid anyway (utils.py:57) — both routes agree.
        # The CHM13 haploid model is weakly calibrated on synthetic reads
        # (alt usually tops but near 0.5), so assert presence in the
        # unfiltered output + GT form, not confident PASS calls.
        unf = list(VcfReader(os.path.join(out, "h1.unfiltered.snps.vcf.gz")))
        assert unf and all(r.sample_field("GT") == "1/1" for r in unf)
        planted = {p + 1 for p, a, g in snps}
        got = {r.pos for r in unf}
        assert len(planted & got) >= 0.7 * len(planted)
        # haploid quals use the ×100 Phred scale (snpCaller.py:192)
        assert any(r.qual_value > 15 for r in unf)
        ind = list(VcfReader(outputs["indels"]))
        del_hits = [r for r in ind if abs(r.pos - 3001) <= 3
                    and any(len(r.ref) - len(a) == 5 for a in r.alt.split(","))]
        assert del_hits, [(r.pos, r.ref, r.alt) for r in ind]

    @pytest.mark.parametrize("preset", ["ccs", "clr"])
    def test_pacbio_presets_model_swap(self, tmp_path, preset):
        """CCS/CLR presets: pacbio band schedule + window sizes, CCS/CLR
        SNP models and per-preset indel thresholds run end to end."""
        rng = np.random.default_rng(3 + len(preset))
        L = 8000
        ref_seq = random_seq(rng, L)
        snps = []
        for i, pos in enumerate(range(500, L - 500, 450)):
            rb = ref_seq[pos]
            snps.append((pos, "ACGT"[("ACGT".index(rb) + 1) % 4],
                         "hom" if i % 3 == 2 else ("het1" if i % 2 else "het2")))
        indels = [(3000, "ins", "TTTT", "hom")]
        err = 0.005 if preset == "ccs" else 0.05
        reads = make_diploid_readset(rng, ref_seq, snps=snps, indels=indels,
                                     depth=30, read_len=1200, error_rate=err)
        fasta_p = str(tmp_path / "pb.fa")
        write_fasta(fasta_p, {"chr_t": ref_seq})
        bam_p = str(tmp_path / "pb.bam")
        write_bam(bam_p, "chr_t", L, reads)
        out = str(tmp_path / ("out_" + preset))
        outputs = main([
            "--bam", bam_p, "--ref", fasta_p, "--mode", "all",
            "--preset", preset, "--output", out, "--prefix", "p",
            "--phase_qual_score", "4"])
        recs = list(VcfReader(outputs["snps"]))
        planted = {p + 1 for p, a, g in snps}
        got = {r.pos for r in recs}
        # the CCS/CLR models must recover a solid share of planted SNPs
        assert len(planted & got) >= 0.5 * len(planted), (
            preset, len(planted & got), len(planted))
        assert outputs["final"] is not None

    def test_multi_contig(self, tmp_path):
        """Two contigs in one BAM: per-contig phasing, contig-ordered
        sorted outputs, and a haploid chrM alongside a diploid autosome."""
        from fixtures import write_bam_multi

        rng = np.random.default_rng(77)
        contigs = {"chrA": 9000, "chrM": 5000}
        seqs = {c: random_seq(rng, L) for c, L in contigs.items()}
        contig_reads = {}
        planted = {}
        for contig, L in contigs.items():
            snps = []
            for i, pos in enumerate(range(600, L - 600, 400)):
                rb = seqs[contig][pos]
                alt = "ACGT"[("ACGT".index(rb) + 1) % 4]
                gt = "hom" if contig == "chrM" else ("het1" if i % 2 else "het2")
                snps.append((pos, alt, gt))
            planted[contig] = snps
            contig_reads[contig] = make_diploid_readset(
                rng, seqs[contig], snps=snps, depth=36, read_len=1400,
                error_rate=0.02)
        fasta_p = str(tmp_path / "multi.fa")
        write_fasta(fasta_p, seqs)
        bam_p = str(tmp_path / "multi.bam")
        write_bam_multi(bam_p, contig_reads, contigs)
        out = str(tmp_path / "outm")
        outputs = main([
            "--bam", bam_p, "--ref", fasta_p, "--mode", "all",
            "--output", out, "--prefix", "m", "--phase_qual_score", "4"])
        recs = list(VcfReader(outputs["snps"]))
        by_contig = {}
        for r in recs:
            by_contig.setdefault(r.chrom, []).append(r.pos)
        assert set(by_contig) == {"chrA", "chrM"}
        # contig-major sorted order
        flat = [(r.chrom, r.pos) for r in recs]
        assert flat == sorted(flat, key=lambda t: (["chrA", "chrM"].index(t[0]), t[1]))
        for c in by_contig:
            assert by_contig[c] == sorted(by_contig[c])
        # chrM auto-haploid → all 1/1; chrA has phased hets
        m_recs = [r for r in recs if r.chrom == "chrM"]
        assert m_recs and all(r.sample_field("GT") == "1/1" for r in m_recs)
        phased = [r for r in VcfReader(outputs["phased_snps"])
                  if r.chrom == "chrA" and r.sample_field("GT") in ("0|1", "1|0")]
        assert len(phased) >= 2
        # indexed fetch per contig works on the final file
        final = VcfReader(outputs["final"])
        assert list(final.fetch("chrM"))

    def test_no_variant_genome(self, tmp_path):
        """A sample with zero variants (and one uncovered contig) must
        produce valid empty-bodied, indexed outputs without crashing."""
        rng = np.random.default_rng(1)
        seqs = {"cA": random_seq(rng, 5000), "cEmpty": random_seq(rng, 2000)}
        reads = make_diploid_readset(rng, seqs["cA"], snps=[], depth=20,
                                     read_len=800)
        from fixtures import write_bam_multi

        fasta_p = str(tmp_path / "nv.fa")
        write_fasta(fasta_p, seqs)
        bam_p = str(tmp_path / "nv.bam")
        write_bam_multi(bam_p, {"cA": reads}, {c: len(s) for c, s in seqs.items()})
        out = str(tmp_path / "outn")
        outputs = main([
            "--bam", bam_p, "--ref", fasta_p, "--mode", "all",
            "--output", out, "--prefix", "n", "--suppress_progress_bar"])
        assert outputs["snps"] and os.path.exists(outputs["snps"])
        pass_recs = list(VcfReader(outputs["snps"]))
        assert pass_recs == []  # nothing PASS on a variant-free genome
        assert outputs["indels"] and list(VcfReader(outputs["indels"])) == []

    def test_many_small_contigs(self, tmp_path):
        """Draft-assembly shape: 40 small scaffolds in one BAM; region
        planning, per-contig phasing loop, and contig-ordered output must
        hold up (and contigs with no reads must not break anything)."""
        from fixtures import write_bam_multi

        rng = np.random.default_rng(99)
        contigs = {"scaf%02d" % i: 3000 for i in range(40)}
        seqs = {c: random_seq(rng, L) for c, L in contigs.items()}
        contig_reads = {}
        for k, (contig, L) in enumerate(contigs.items()):
            if k % 7 == 6:
                continue  # some scaffolds have no coverage
            snps = []
            for pos in (800, 1600, 2400):
                rb = seqs[contig][pos]
                snps.append((pos, "ACGT"[("ACGT".index(rb) + 1) % 4], "hom"))
            contig_reads[contig] = make_diploid_readset(
                rng, seqs[contig], snps=snps, depth=24, read_len=900,
                error_rate=0.02)
        fasta_p = str(tmp_path / "scaf.fa")
        write_fasta(fasta_p, seqs)
        bam_p = str(tmp_path / "scaf.bam")
        write_bam_multi(bam_p, contig_reads, contigs)
        out = str(tmp_path / "outs")
        outputs = main([
            "--bam", bam_p, "--ref", fasta_p, "--mode", "all",
            "--output", out, "--prefix", "sc", "--suppress_progress_bar"])
        recs = list(VcfReader(outputs["snps"]))
        by_contig = {}
        for r in recs:
            by_contig.setdefault(r.chrom, []).append(r.pos)
        assert len(by_contig) >= 25
        order = [r.chrom for r in recs]
        ranks = {c: i for i, c in enumerate(contigs)}
        assert order == sorted(order, key=lambda c: ranks[c])
        # final concat exists and indexes fetch a middle scaffold
        assert list(VcfReader(outputs["final"]).fetch("scaf10"))

    def test_sharded_hosts_match_single_run(self, tmp_path):
        """--num_shards/--shard_index region sharding: two 'host' runs +
        merge produce the same records as one unsharded run."""
        from fixtures import write_bam_multi

        rng = np.random.default_rng(55)
        contigs = {"chrA": 7000, "chrB": 7000}
        seqs = {c: random_seq(rng, L) for c, L in contigs.items()}
        contig_reads = {}
        for contig, L in contigs.items():
            snps = []
            for i, pos in enumerate(range(600, L - 600, 400)):
                rb = seqs[contig][pos]
                alt = "ACGT"[("ACGT".index(rb) + 1) % 4]
                snps.append((pos, alt, ("het1", "het2", "hom")[i % 3]))
            contig_reads[contig] = make_diploid_readset(
                rng, seqs[contig], snps=snps, depth=32, read_len=1300,
                error_rate=0.02)
        fasta_p = str(tmp_path / "sh.fa")
        write_fasta(fasta_p, seqs)
        bam_p = str(tmp_path / "sh.bam")
        write_bam_multi(bam_p, contig_reads, contigs)

        out = str(tmp_path / "out")
        base = ["--bam", bam_p, "--ref", fasta_p, "--mode", "all",
                "--output", out, "--prefix", "s", "--phase_qual_score", "4"]
        single = main(base)
        want = [(r.chrom, r.pos, r.ref, r.alt, r.qual, r.samples)
                for r in VcfReader(single["final"])]

        out2 = str(tmp_path / "out2")
        base2 = ["--bam", bam_p, "--ref", fasta_p, "--mode", "all",
                 "--output", out2, "--prefix", "s",
                 "--phase_qual_score", "4", "--num_shards", "2"]
        main(base2 + ["--shard_index", "0"])
        main(base2 + ["--shard_index", "1"])
        merged = main(["--bam", bam_p, "--ref", fasta_p, "--output", out2,
                       "--prefix", "s", "--num_shards", "2",
                       "--merge_shards"])
        assert os.path.exists(merged["final"])
        got = [(r.chrom, r.pos, r.ref, r.alt, r.qual, r.samples)
               for r in VcfReader(merged["final"])]
        assert got == want and len(got) > 10

    def test_indels_mode_with_tagged_bam(self, tmp_path):
        # pre-tagged BAM straight into indel-only mode
        indels = [(2000, "ins", "AAAA", "het2")]
        fasta_p, bam_p, _, _ = make_fixture(
            tmp_path, depth=36, L=4000, read_len=900, seed=33, snps=[],
            indels=indels, tag_haplotypes=True)
        out = str(tmp_path / "outi")
        outputs = main([
            "--bam", bam_p, "--ref", fasta_p, "--mode", "indels",
            "--output", out, "--prefix", "i1"])
        assert outputs["indels"]
        recs = list(VcfReader(outputs["indels"]))
        hits = [r for r in recs if abs(r.pos - 2001) <= 3]
        assert hits, [(r.pos, r.ref, r.alt) for r in recs]
