"""Indel calling CNNs (diploid + haploid) as flax modules.

Architecture parity:
- diploid  Indel_model          → model_architect_indel.py:6-48
  input (B,15,128,2) = hap0/hap1/all MSA tensors stacked on rows
  (indelCaller.py:83); output 4-way softmax over
  {hom-ref, hom-alt, het-ref, het-alt} (indelCaller.py:14)
- haploid  haploid_Indel_model  → model_architect_indels_haploid.py:7-48
  input (B,5,128,2); output sigmoid indel-present probability
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax.nn import selu, sigmoid, softmax


def _trunk(x):
    c1 = selu(nn.Conv(8, (1, 5), padding="SAME", name="conv1_1")(x))
    c2 = selu(nn.Conv(8, (5, 1), padding="SAME", name="conv1_2")(x))
    c3 = selu(nn.Conv(8, (5, 5), padding="SAME", name="conv1_3")(x))
    m = jnp.concatenate([c1, c2, c3], axis=-1)
    m = selu(nn.Conv(32, (2, 3), strides=(1, 2), padding="VALID", name="conv2")(m))
    m = selu(nn.Conv(48, (2, 3), strides=(1, 2), padding="VALID", name="conv3")(m))
    flat = m.reshape((m.shape[0], -1))
    fc1 = selu(nn.Dense(32, name="fc1")(flat))
    return selu(nn.Dense(24, name="fc2")(fc1))


class IndelModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B,15,128,2) float32 → (B,4) genotype-class probabilities."""
        fc2 = _trunk(x)
        return softmax(nn.Dense(4, name="fc3")(fc2), axis=-1)


class HaploidIndelModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B,5,128,2) float32 → (B,1) indel-present probability."""
        fc2 = _trunk(x)
        return sigmoid(nn.Dense(1, name="fc3")(fc2))
