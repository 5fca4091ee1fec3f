import os
import sys

import numpy as np
import pytest

from nanocaller_tpu.models import (
    HaploidIndelModel,
    HaploidSNPModel,
    IndelModel,
    SNPModel,
    load_model,
)
from nanocaller_tpu.models.registry import available_models

REF = "/root/reference/nanocaller_src"
HAVE_REF = os.path.exists(REF)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class TestLoading:
    def test_all_packs_load_and_apply(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 5, 41, 5)).astype(np.float32)
        ref = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 3)]
        for name in available_models("snp"):
            params, cov = load_model("snp", name)
            if name == "haploid":
                out = HaploidSNPModel().apply(params, x, ref)
                assert out.shape == (3, 4)
                np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)
            else:
                probs, gt = SNPModel().apply(params, x, ref)
                assert probs.shape == (3, 4, 2) and gt.shape == (3, 2)
        xi = rng.normal(size=(2, 15, 128, 2)).astype(np.float32)
        xh = rng.normal(size=(2, 5, 128, 2)).astype(np.float32)
        for name in available_models("indel"):
            params, _ = load_model("indel", name)
            if name == "haploid":
                out = HaploidIndelModel().apply(params, xh)
                assert out.shape == (2, 1)
            else:
                out = IndelModel().apply(params, xi)
                assert out.shape == (2, 4)
                np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)

    def test_coverage_sidecars(self):
        _, cov = load_model("snp", "ONT-HG002")
        assert cov == 48.0
        _, cov = load_model("snp", "CLR-HG002")
        assert cov == 58.0


@pytest.mark.skipif(not HAVE_REF, reason="needs reference checkpoints")
class TestTFParity:
    """Run the reference forward pass with raw tf.nn ops fed from the
    original checkpoint tensors and check our flax models match
    probability-for-probability (float32, atol 2e-5).

    Wiring per model_architect.py:36-64, model_architect_indel.py:28-48,
    model_architect_SNP_haploid.py:33-53.
    """

    @pytest.fixture(scope="class")
    def tf(self):
        return pytest.importorskip("tensorflow")

    def _flat(self, rel, h5_map=None):
        from tools.convert_weights import convert_ckpt, convert_h5

        path = os.path.join(REF, rel)
        if h5_map is not None:
            return convert_h5(path, h5_map)
        return convert_ckpt(path)

    @staticmethod
    def _trunk_tf(tf, w, x):
        def conv(name, x, strides, padding):
            y = tf.nn.conv2d(x, w[name + "/kernel"], strides, padding)
            return tf.nn.selu(y + w[name + "/bias"])

        m = tf.concat(
            [conv("conv1_1", x, [1, 1], "SAME"),
             conv("conv1_2", x, [1, 1], "SAME"),
             conv("conv1_3", x, [1, 1], "SAME")],
            3,
        )
        m = conv("conv2", m, [1, 1, 2, 1], "VALID")
        m = conv("conv3", m, [1, 1, 2, 1], "VALID")
        return tf.reshape(m, [x.shape[0], -1])

    def test_snp_diploid(self, tf):
        w = self._flat("release_data/ONT_models/SNPs/HG002_guppy4.2.2_giab-4.2.1/model-100")
        rng = np.random.default_rng(1)
        x = (rng.normal(size=(16, 5, 41, 5)) * 3).astype(np.float32)
        refoh = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 16)]

        dense = lambda n, h: tf.matmul(h, w[n + "/kernel"]) + w[n + "/bias"]
        flat = self._trunk_tf(tf, w, tf.constant(x))
        fc1 = tf.nn.selu(dense("fc1", flat))
        fa = tf.nn.selu(dense("fa", fc1))
        outs = [
            tf.nn.softmax(dense(h, tf.concat([fa, refoh[:, i : i + 1]], 1)))
            for i, h in enumerate("AGTC")
        ]
        fc2 = tf.nn.selu(dense("fc2", fc1))
        fc3 = tf.nn.selu(dense("fc3", tf.concat([fc2] + outs, 1)))
        want_gt = tf.nn.softmax(dense("GT", fc3)).numpy()
        want_probs = np.stack([o.numpy() for o in outs], axis=1)

        params, _ = load_model("snp", "ONT-HG002")
        probs, gt = SNPModel().apply(params, x, refoh)
        np.testing.assert_allclose(np.asarray(probs), want_probs, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gt), want_gt, atol=2e-5)

    def test_indel_diploid(self, tf):
        w = self._flat("release_data/ONT_models/indels/HG002_guppy4.2_giab-4.2.1/model-100")
        rng = np.random.default_rng(2)
        x = rng.normal(size=(8, 15, 128, 2)).astype(np.float32)
        dense = lambda n, h: tf.matmul(h, w[n + "/kernel"]) + w[n + "/bias"]
        flat = self._trunk_tf(tf, w, tf.constant(x))
        fc1 = tf.nn.selu(dense("fc1", flat))
        fc2 = tf.nn.selu(dense("fc2", fc1))
        want = tf.nn.softmax(dense("fc3", fc2)).numpy()
        params, _ = load_model("indel", "ONT-HG002")
        got = np.asarray(IndelModel().apply(params, x))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_snp_haploid_h5(self, tf):
        from tools.convert_weights import H5_MAP_SNP

        w = self._flat("release_data/haploid_models/SNPs/CHM13/model.24-0.9985.h5", H5_MAP_SNP)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(4, 5, 41, 5)).astype(np.float32)
        refoh = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 4)]
        dense = lambda n, h: tf.matmul(h, w[n + "/kernel"]) + w[n + "/bias"]
        flat = self._trunk_tf(tf, w, tf.constant(x))
        fc1 = tf.nn.selu(dense("fc1", flat))
        fc2 = tf.nn.selu(dense("fc2", fc1))
        fc3 = tf.nn.selu(dense("fc3", tf.concat([fc2, refoh], 1)))
        want = tf.nn.softmax(fc3).numpy()
        params, _ = load_model("snp", "haploid")
        got = np.asarray(HaploidSNPModel().apply(params, x, refoh))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_indel_haploid_h5(self, tf):
        from tools.convert_weights import H5_MAP_INDEL

        w = self._flat("release_data/haploid_models/indels/CHM13/model.19-0.9811.h5", H5_MAP_INDEL)
        rng = np.random.default_rng(4)
        x = rng.normal(size=(4, 5, 128, 2)).astype(np.float32)
        dense = lambda n, h: tf.matmul(h, w[n + "/kernel"]) + w[n + "/bias"]
        flat = self._trunk_tf(tf, w, tf.constant(x))
        fc1 = tf.nn.selu(dense("fc1", flat))
        fc2 = tf.nn.selu(dense("fc2", fc1))
        want = tf.sigmoid(dense("fc3", fc2)).numpy()
        params, _ = load_model("indel", "haploid")
        got = np.asarray(HaploidIndelModel().apply(params, x))
        np.testing.assert_allclose(got, want, atol=2e-5)
