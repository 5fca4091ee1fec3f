import os

import numpy as np
import pytest

from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.io.vcf import VcfRecord, VcfWriter, VcfReader
from nanocaller_tpu.models import SNPModel, load_model
from nanocaller_tpu.train.data import (
    batches_from_examples,
    generate_snp_training_examples,
    load_shards,
    save_shard,
    truth_snps,
)
from nanocaller_tpu.train.indel_train import (
    label_candidates_from_truth,
    train_indel_model,
)
from nanocaller_tpu.train.snp_train import snp_loss, train_snp_model

from fixtures import make_fixture


@pytest.fixture(scope="module")
def train_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    fasta_p, bam_p, ref_seq, snps = make_fixture(
        tmp, depth=30, L=12000, read_len=1200, seed=9, error_rate=0.02)
    # truth VCF from planted snps
    vcf_p = str(tmp / "truth.vcf.gz")
    hdr = ["##fileformat=VCFv4.2", "##contig=<ID=chr_t>",
           '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
    with VcfWriter(vcf_p, hdr) as w:
        for pos, alt, gt in snps:
            gt_str = "1/1" if gt == "hom" else "0/1"
            w.write(VcfRecord("chr_t", pos + 1, ref_seq[pos], alt, "50",
                              "PASS", format_="GT", samples=[gt_str]))
    return fasta_p, bam_p, vcf_p, ref_seq, snps


class TestData:
    def test_truth_parse(self, train_fixture):
        fasta_p, bam_p, vcf_p, ref_seq, snps = train_fixture
        tr = truth_snps(VcfReader(vcf_p), "chr_t", 1, 12000)
        assert len(tr) == len(snps)
        for pos, alt, gt in snps:
            g, a1, a2 = tr[pos]
            assert g == (0 if gt == "hom" else 1)

    def test_generate_and_roundtrip(self, train_fixture, tmp_path):
        fasta_p, bam_p, vcf_p, ref_seq, snps = train_fixture
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        truth = truth_snps(VcfReader(vcf_p), "chr_t", 1, 12000)
        ex = generate_snp_training_examples(
            bam, fasta, truth, {"chrom": "chr_t", "start": 1, "end": 12000},
            mincov=8)
        # every truth site appears (twice: freq-nbrs and truth-nbrs)
        n_pos = int((ex["gt"] >= 0).sum())
        truth_hits = sum(1 for p in ex["pos"] if int(p) in truth)
        assert truth_hits >= len(truth)  # at least one variant each
        assert (ex["x"].shape[1:] == (5, 41, 5))
        # negatives present with ref-labels
        negs = [i for i, p in enumerate(ex["pos"]) if int(p) not in truth]
        assert negs
        i = negs[0]
        assert ex["allele1"][i] == ex["ref"][i] == ex["allele2"][i]
        p = save_shard(str(tmp_path / "shard0.npz"), ex)
        back = load_shards([p])
        np.testing.assert_array_equal(back["x"], ex["x"])

    def test_batches(self, train_fixture):
        fasta_p, bam_p, vcf_p, ref_seq, snps = train_fixture
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        truth = truth_snps(VcfReader(vcf_p), "chr_t", 1, 12000)
        ex = generate_snp_training_examples(
            bam, fasta, truth, {"chrom": "chr_t", "start": 1, "end": 12000},
            mincov=8)
        rng = np.random.default_rng(0)
        b = next(batches_from_examples(ex, 8, rng))
        assert b["x"].shape == (8, 5, 41, 5)
        assert b["base_labels"].shape == (8, 4, 2)
        np.testing.assert_allclose(b["base_labels"].sum(-1), 1.0)
        assert b["gt_label"].shape == (8, 2)


class TestTraining:
    def test_snp_training_reduces_loss(self, train_fixture, tmp_path):
        fasta_p, bam_p, vcf_p, ref_seq, snps = train_fixture
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        truth = truth_snps(VcfReader(vcf_p), "chr_t", 1, 12000)
        ex = generate_snp_training_examples(
            bam, fasta, truth, {"chrom": "chr_t", "start": 1, "end": 12000},
            mincov=8)
        params, history = train_snp_model(
            ex, ex, str(tmp_path / "ckpt"), epochs=3, batch_size=16,
            log=lambda *a: None)
        assert history[-1]["loss"] < history[0]["loss"]
        assert history[-1]["val_acc"] is not None
        # checkpoint loadable by the inference registry
        import os
        p, cov = load_model("snp", history[-1]["ckpt"])
        assert cov == 0.0
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 5, 41, 5)).astype(np.float32)
        ref = np.eye(4, dtype=np.float32)[[0, 1]]
        probs, gt = SNPModel().apply(p, x, ref)
        assert probs.shape == (2, 4, 2)

    def test_retrain_from_released_weights(self, train_fixture, tmp_path):
        fasta_p, bam_p, vcf_p, ref_seq, snps = train_fixture
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        truth = truth_snps(VcfReader(vcf_p), "chr_t", 1, 12000)
        ex = generate_snp_training_examples(
            bam, fasta, truth, {"chrom": "chr_t", "start": 1, "end": 12000},
            mincov=8)
        init, _ = load_model("snp", "ONT-HG002")
        params, history = train_snp_model(
            ex, None, str(tmp_path / "rt"), epochs=1, batch_size=16,
            init_params=init, log=lambda *a: None)
        assert history[0]["loss"] is not None

    def test_indel_training(self, tmp_path):
        rng = np.random.default_rng(0)
        N = 64
        x = rng.normal(size=(N, 15, 128, 2)).astype(np.float32)
        labels = rng.integers(0, 4, N)
        params, history = train_indel_model(
            x, labels, str(tmp_path / "ic"), epochs=3, batch_size=16,
            log=lambda *a: None)
        assert history[-1]["loss"] < history[0]["loss"]

    def test_indel_feature_generation(self, tmp_path):
        from nanocaller_tpu.train.indel_data import (
            generate_indel_training_examples, truth_indels)
        from nanocaller_tpu.io.vcf import VcfRecord, VcfWriter

        indels = [(1500, "del", 6, "het1"), (3000, "ins", "TTTTT", "hom")]
        fasta_p, bam_p, ref_seq, _ = make_fixture(
            tmp_path, depth=36, L=5000, read_len=900, seed=21, snps=[],
            indels=indels, tag_haplotypes=True)
        hdr = ["##fileformat=VCFv4.2", "##contig=<ID=chr_t>",
               '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
               "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
        vcf_p = str(tmp_path / "truth_ind.vcf.gz")
        with VcfWriter(vcf_p, hdr) as w:
            w.write(VcfRecord("chr_t", 1501, ref_seq[1500:1507],
                              ref_seq[1500], "50", "PASS", format_="GT",
                              samples=["0/1"]))
            w.write(VcfRecord("chr_t", 3001, ref_seq[3000],
                              ref_seq[3000] + "TTTTT", "50", "PASS",
                              format_="GT", samples=["1/1"]))
        truth = truth_indels(VcfReader(vcf_p), "chr_t", 1, 5000)
        assert truth == {1500: 2, 3000: 1}
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        x, labels, pos = generate_indel_training_examples(
            bam, fasta, truth, {"chrom": "chr_t", "start": 1, "end": 5000})
        assert x.shape[1:] == (15, 128, 2) and len(x) == len(labels) > 0
        # positives present with the right classes
        assert 2 in labels and 1 in labels
        # training works end-to-end on these features
        params, history = train_indel_model(
            x, labels, str(tmp_path / "ick"), epochs=2,
            batch_size=min(8, len(x)), log=lambda *a: None)
        assert history[-1]["loss"] is not None

    def test_train_cli_end_to_end(self, train_fixture, tmp_path):
        """tools/train_snp.py: feature gen → train → checkpoint usable by
        inference, through the CLI surface."""
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        import train_snp

        fasta_p, bam_p, vcf_p, ref_seq, snps = train_fixture
        out = str(tmp_path / "cliout")
        history = train_snp.main([
            "--bam", bam_p, "--ref", fasta_p, "--truth_vcf", vcf_p,
            "--regions", "chr_t:1-12000", "--output", out,
            "--epochs", "2", "--batch_size", "16", "--val_every", "2",
            "--chunk_size", "6000", "--train_coverage", "30"])
        assert len(history) == 2
        ckpt = history[-1]["ckpt"]
        assert os.path.exists(ckpt)
        assert os.path.exists(ckpt.replace(".npz", ".coverage"))
        p, cov = load_model("snp", ckpt)
        assert cov == 30.0

    def test_indel_train_cli(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        import train_indel
        from nanocaller_tpu.io.vcf import VcfRecord, VcfWriter

        indels = [(1500, "del", 6, "het1"), (3000, "ins", "TTTTT", "hom")]
        fasta_p, bam_p, ref_seq, _ = make_fixture(
            tmp_path, depth=30, L=5000, read_len=900, seed=23, snps=[],
            indels=indels, tag_haplotypes=True)
        hdr = ["##fileformat=VCFv4.2", "##contig=<ID=chr_t>",
               '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
               "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
        vcf_p = str(tmp_path / "ti.vcf.gz")
        with VcfWriter(vcf_p, hdr) as w:
            w.write(VcfRecord("chr_t", 1501, ref_seq[1500:1507],
                              ref_seq[1500], "50", "PASS", format_="GT",
                              samples=["0/1"]))
            w.write(VcfRecord("chr_t", 3001, ref_seq[3000],
                              ref_seq[3000] + "TTTTT", "50", "PASS",
                              format_="GT", samples=["1/1"]))
        out = str(tmp_path / "iout")
        history = train_indel.main([
            "--bam", bam_p, "--ref", fasta_p, "--truth_vcf", vcf_p,
            "--regions", "chr_t:1-5000", "--output", out, "--epochs", "2",
            "--batch_size", "8"])
        assert history and os.path.exists(history[-1]["ckpt"])

    def test_label_candidates(self):
        class FakeBatch:
            pos = [100, 205, 300]

            def __len__(self):
                return 3

        labels = label_candidates_from_truth(FakeBatch(), {102: 3, 210: 1})
        assert labels.tolist() == [3, 1, 0]
