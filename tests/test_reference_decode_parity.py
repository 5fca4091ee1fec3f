"""Differential parity for the SNP DECODE stage: run the reference's
snpCaller.caller() unmodified (pysam shim + TF-twin models carrying our
converted weights, since Keras 3 cannot restore the original subclassed
checkpoints) and diff the emitted VCF body lines against ours.

Closes the last link of the parity chain at the line level: identical
features (test_reference_parity) × identical models (test_models) ×
identical decode (here) ⇒ identical VCFs.
"""

import importlib
import os
import queue
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_ROOT, "nanocaller_src/snpCaller.py")),
    reason="reference sources unavailable")

tf = pytest.importorskip("tensorflow")

from nanocaller_tpu.config import Config
from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.models.registry import _pack_path
from nanocaller_tpu.models.weights import params_from_npz
from nanocaller_tpu.snp_caller import SnpCallerState, call_chunk

from fixtures import make_fixture


def _tf_weights(kind, name):
    tree = params_from_npz(_pack_path(kind, name))["params"]
    return {"%s/%s" % (l, v): tf.constant(val)
            for l, vs in tree.items() for v, val in vs.items()}


class _TwinSNPModel:
    """Callable standing in for the reference SNP_model: same wiring
    (model_architect.py:36-64), weights from our converted packs."""

    def __init__(self):
        self.w = _tf_weights("snp", "ONT-HG002")

    def load_weights(self, path):
        class _R:
            def expect_partial(self):
                return self
        return _R()

    def _conv(self, name, x, strides, padding):
        return tf.nn.selu(tf.nn.conv2d(x, self.w[name + "/kernel"], strides,
                                       padding) + self.w[name + "/bias"])

    def _dense(self, name, h):
        return tf.matmul(h, self.w[name + "/kernel"]) + self.w[name + "/bias"]

    def __call__(self, inputs):
        x, ar, gr, tr, cr = inputs
        x = tf.cast(x, tf.float32)
        m = tf.concat([self._conv("conv1_1", x, [1, 1], "SAME"),
                       self._conv("conv1_2", x, [1, 1], "SAME"),
                       self._conv("conv1_3", x, [1, 1], "SAME")], 3)
        m = self._conv("conv3", self._conv("conv2", m, [1, 1, 2, 1], "VALID"),
                       [1, 1, 2, 1], "VALID")
        flat = tf.reshape(m, [tf.shape(x)[0], -1])
        fc1 = tf.nn.selu(self._dense("fc1", flat))
        fa = tf.nn.selu(self._dense("fa", fc1))
        outs = []
        for head, ref in zip("AGTC", (ar, gr, tr, cr)):
            h = tf.concat([fa, tf.cast(ref, tf.float32)], 1)
            outs.append(tf.nn.softmax(self._dense(head, h)))
        fc2 = tf.nn.selu(self._dense("fc2", fc1))
        fc3 = tf.nn.selu(self._dense("fc3", tf.concat([fc2] + outs, 1)))
        gt = tf.nn.softmax(self._dense("GT", fc3))
        return [o.numpy() for o in outs] + [gt.numpy()]


class _TwinHaploidModel:
    def __init__(self):
        self.w = _tf_weights("snp", "haploid")

    def load_weights(self, path):
        return None

    def __call__(self, inputs):
        x, ref = inputs
        x = tf.cast(x, tf.float32)
        conv = lambda n, h, s, p: tf.nn.selu(
            tf.nn.conv2d(h, self.w[n + "/kernel"], s, p) + self.w[n + "/bias"])
        dense = lambda n, h: tf.matmul(h, self.w[n + "/kernel"]) + self.w[n + "/bias"]
        m = tf.concat([conv("conv1_1", x, [1, 1], "SAME"),
                       conv("conv1_2", x, [1, 1], "SAME"),
                       conv("conv1_3", x, [1, 1], "SAME")], 3)
        m = conv("conv3", conv("conv2", m, [1, 1, 2, 1], "VALID"),
                 [1, 1, 2, 1], "VALID")
        flat = tf.reshape(m, [tf.shape(x)[0], -1])
        fc1 = tf.nn.selu(dense("fc1", flat))
        fc2 = tf.nn.selu(dense("fc2", fc1))
        fc3 = tf.nn.selu(dense("fc3", tf.concat([fc2, tf.cast(ref, tf.float32)], 1)))
        return tf.nn.softmax(fc3)


@pytest.fixture(scope="module")
def ref_snp_caller():
    import pysam_shim
    import test_reference_parity as T

    sys.modules["pysam"] = pysam_shim
    sys.modules["intervaltree"] = T._FakeIntervalModule
    pkg = types.ModuleType("nanocaller_src")
    pkg.__path__ = [os.path.join(REF_ROOT, "nanocaller_src")]
    sys.modules["nanocaller_src"] = pkg
    mod = importlib.import_module("nanocaller_src.snpCaller")
    mod.SNP_model = _TwinSNPModel
    mod.haploid_SNP_model = _TwinHaploidModel
    mod.current_process = lambda: types.SimpleNamespace(_identity=[7])
    return mod


def _parse(line):
    f = line.rstrip("\n").split("\t")
    info = f[7]
    return {"pos": int(f[1]), "ref": f[3], "alt": f[4],
            "qual": float(f[5]), "filter": f[6],
            "pr": [float(x) for x in info.split(";")[0][3:].split(",")],
            "fq": float(info.split("FQ=")[1]),
            "fmt": f[8], "sample": f[9]}


@pytest.mark.parametrize("ploidy", ["diploid", "haploid"])
def test_snp_vcf_lines_match_reference(ref_snp_caller, tmp_path_factory,
                                       ploidy):
    tmp = tmp_path_factory.mktemp("decode_par_" + ploidy)
    fasta_p, bam_p, ref_seq, snps = make_fixture(
        tmp, depth=30, L=16000, read_len=2200, seed=6, error_rate=0.04)

    params = {
        "intermediate_snp_files_dir": str(tmp),
        "prefix": "ref",
        "snp_model": "ONT-HG002",
        "exclude_bed": None,
        "sam_path": bam_p,
        "fasta_path": fasta_p,
        "threshold": [0.4, 0.6],
        "mincov": 4, "maxcov": 160, "min_allele_freq": 0.15,
        "min_nbr_sites": 1, "seq": "ont", "supplementary": False,
        "disable_coverage_normalization": False,
    }
    chunks_Q = queue.Queue()
    chunk = {"chrom": "chr_t", "start": 2001, "end": 14000, "ploidy": ploidy}
    chunks_Q.put(dict(chunk))
    counter_Q = queue.Queue()
    snp_files = []
    ref_snp_caller.caller(params, chunks_Q, counter_Q, snp_files)
    ref_lines = open(snp_files[0]).readlines()
    assert len(ref_lines) > 5

    cfg = Config(bam=bam_p, ref=fasta_p, batch_size=512)
    state = SnpCallerState.create("ONT-HG002")
    bam = BamReader(bam_p)
    fasta = FastaFile(fasta_p)
    ours = call_chunk(state, bam, fasta, chunk, cfg)
    assert len(ours) == len(ref_lines)

    n_exact = 0
    for rl, ol in zip(ref_lines, ours):
        if rl == ol:
            n_exact += 1
            continue
        # allow last-digit rounding differences from TF-vs-XLA float32
        a, b = _parse(rl), _parse(ol)
        assert (a["pos"], a["ref"], a["alt"], a["filter"], a["fmt"]) == \
               (b["pos"], b["ref"], b["alt"], b["filter"], b["fmt"]), (rl, ol)
        assert abs(a["qual"] - b["qual"]) < 0.51, (rl, ol)
        np.testing.assert_allclose(a["pr"], b["pr"], atol=2e-4)
        assert abs(a["fq"] - b["fq"]) < 1e-4
        sa, sb = a["sample"].split(":"), b["sample"].split(":")
        assert sa[0] == sb[0], (rl, ol)  # GT identical
        assert sa[1] == sb[1]  # DP identical
        if ploidy == "diploid" and sa[2] != ".":
            assert sa[3:] == sb[3:]  # AD/ADF/ADR identical
    # the overwhelming majority must be byte-identical
    assert n_exact >= 0.9 * len(ref_lines), (n_exact, len(ref_lines))


@pytest.mark.parametrize("ploidy", ["diploid", "haploid"])
def test_decode_tree_byte_exact_given_reference_probs(
        ref_snp_caller, tmp_path_factory, monkeypatch, ploidy):
    """VERDICT r1 item 6 — isolate the decode tree from model-forward
    float drift: capture the probabilities the REFERENCE decode actually
    consumed (the twin model's outputs, batch-concatenated in order) and
    feed them into OUR decode over OUR feature batch. Result must be
    100% byte-identical to the reference's VCF lines.

    Together with test_snp_vcf_lines_match_reference this pins the ≤10%
    non-exact residue entirely on the TF↔XLA float32 forward difference,
    which test_models bounds at 2e-5 in probability — the decode logic,
    formatting, and feature/ordering layers are exactly parity."""
    from nanocaller_tpu.pileup.snp_features import get_snp_candidates
    from nanocaller_tpu.snp_caller import decode_diploid, decode_haploid

    tmp = tmp_path_factory.mktemp("decode_iso_" + ploidy)
    fasta_p, bam_p, ref_seq, snps = make_fixture(
        tmp, depth=30, L=16000, read_len=2200, seed=6, error_rate=0.04)

    captured = []
    if ploidy == "diploid":
        orig = _TwinSNPModel.__call__

        def capturing(self, inputs):
            outs = orig(self, inputs)
            captured.append(np.stack([o[:, 1] for o in outs[:4]], axis=1))
            return outs

        monkeypatch.setattr(_TwinSNPModel, "__call__", capturing)
    else:
        orig_h = _TwinHaploidModel.__call__

        def capturing_h(self, inputs):
            out = orig_h(self, inputs)
            # skip the null build call the reference makes at load time
            # (snpCaller.py:76-77)
            if not (len(inputs[0]) == 1 and not np.any(inputs[0])):
                captured.append(np.asarray(out))
            return out

        monkeypatch.setattr(_TwinHaploidModel, "__call__", capturing_h)

    params = {
        "intermediate_snp_files_dir": str(tmp),
        "prefix": "ref",
        "snp_model": "ONT-HG002",
        "exclude_bed": None,
        "sam_path": bam_p,
        "fasta_path": fasta_p,
        "threshold": [0.4, 0.6],
        "mincov": 4, "maxcov": 160, "min_allele_freq": 0.15,
        "min_nbr_sites": 1, "seq": "ont", "supplementary": False,
        "disable_coverage_normalization": False,
    }
    chunks_Q = queue.Queue()
    chunk = {"chrom": "chr_t", "start": 2001, "end": 14000, "ploidy": ploidy}
    chunks_Q.put(dict(chunk))
    counter_Q = queue.Queue()
    snp_files = []
    ref_snp_caller.caller(params, chunks_Q, counter_Q, snp_files)
    ref_lines = open(snp_files[0]).readlines()
    assert len(ref_lines) > 5 and captured

    cfg = Config(bam=bam_p, ref=fasta_p, batch_size=512)
    bam = BamReader(bam_p)
    fasta = FastaFile(fasta_p)
    batch = get_snp_candidates(
        bam, fasta, chunk, seq_type=cfg.sequencing, mincov=cfg.mincov,
        maxcov=cfg.maxcov, min_allele_freq=cfg.min_allele_freq,
        min_nbr_sites=cfg.min_nbr_sites, threshold=cfg.threshold,
        ploidy=ploidy)
    probs_ref = np.concatenate(captured).astype(np.float32)
    assert len(batch) == len(probs_ref)
    if ploidy == "diploid":
        ours = decode_diploid(batch, probs_ref)
    else:
        ours = decode_haploid(batch, probs_ref)
    assert "".join(ours) == "".join(ref_lines)  # 100% byte-identical
