"""SNP calling CNNs (diploid + haploid) as flax modules.

Architecture parity with the reference Keras models:
- diploid  SNP_model        → model_architect.py:6-64
- haploid  haploid_SNP_model → model_architect_SNP_haploid.py:7-53

Inputs are NHWC (B, 5, 41, 5) pileup tensors (see
pileup/snp_features.py) plus per-candidate reference-base one-hots.
Dropout layers are inference no-ops (Keras `training=False` default),
so they are omitted. All compute in float32 to keep the 0.5 probability
decision thresholds (snpCaller.py:122,138-150) on the same side.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax.nn import selu, softmax


class SNPModel(nn.Module):
    """Diploid SNP model: 3-branch conv trunk + 4 per-base heads + GT head."""

    @nn.compact
    def __call__(self, x, ref, return_logits=False):
        """x: (B,5,41,5) float32; ref: (B,4) one-hot of candidate ref base.

        Returns (probs (B,4,2) for A,G,T,C heads, gt_probs (B,2)); with
        return_logits=True returns the pre-softmax head/GT logits instead
        (used by the training loss, train/snp_train.py).
        """
        c1 = selu(nn.Conv(16, (1, 5), padding="SAME", name="conv1_1")(x))
        c2 = selu(nn.Conv(16, (5, 1), padding="SAME", name="conv1_2")(x))
        c3 = selu(nn.Conv(16, (5, 5), padding="SAME", name="conv1_3")(x))
        m = jnp.concatenate([c1, c2, c3], axis=-1)
        m = selu(nn.Conv(32, (2, 3), strides=(1, 2), padding="VALID", name="conv2")(m))
        m = selu(nn.Conv(64, (2, 3), strides=(1, 2), padding="VALID", name="conv3")(m))
        flat = m.reshape((m.shape[0], -1))
        fc1 = selu(nn.Dense(48, name="fc1")(flat))
        fa = selu(nn.Dense(16, name="fa")(fc1))
        logits, outs = [], []
        for i, head in enumerate(("A", "G", "T", "C")):
            h = jnp.concatenate([fa, ref[:, i : i + 1]], axis=1)
            lg = nn.Dense(2, name=head)(h)
            logits.append(lg)
            outs.append(softmax(lg, axis=-1))
        fc2 = selu(nn.Dense(16, name="fc2")(fc1))
        fc3 = selu(nn.Dense(8, name="fc3")(jnp.concatenate([fc2] + outs, axis=1)))
        gt_logits = nn.Dense(2, name="GT")(fc3)
        if return_logits:
            return jnp.stack(logits, axis=1), gt_logits
        return jnp.stack(outs, axis=1), softmax(gt_logits, axis=-1)


class HaploidSNPModel(nn.Module):
    """Haploid SNP model: same trunk, single 4-way softmax over A/G/T/C."""

    @nn.compact
    def __call__(self, x, ref):
        c1 = selu(nn.Conv(16, (1, 5), padding="SAME", name="conv1_1")(x))
        c2 = selu(nn.Conv(16, (5, 1), padding="SAME", name="conv1_2")(x))
        c3 = selu(nn.Conv(16, (5, 5), padding="SAME", name="conv1_3")(x))
        m = jnp.concatenate([c1, c2, c3], axis=-1)
        m = selu(nn.Conv(32, (2, 3), strides=(1, 2), padding="VALID", name="conv2")(m))
        m = selu(nn.Conv(64, (2, 3), strides=(1, 2), padding="VALID", name="conv3")(m))
        flat = m.reshape((m.shape[0], -1))
        fc1 = selu(nn.Dense(48, name="fc1")(flat))
        fc2 = selu(nn.Dense(16, name="fc2")(fc1))
        # reference applies selu THEN softmax on the 4-way head
        # (model_architect_SNP_haploid.py:29,50-51)
        fc3 = selu(nn.Dense(4, name="fc3")(jnp.concatenate([fc2, ref], axis=1)))
        return softmax(fc3, axis=-1)
