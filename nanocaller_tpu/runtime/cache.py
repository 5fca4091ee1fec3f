"""Shared persistent-cache location (XLA compilation cache + the SNP
shape-memory sidecar live in the same per-machine directory)."""

from __future__ import annotations

import os


def jax_cache_dir():
    return os.environ.get(
        "NANOCALLER_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "nanocaller_tpu_jax"))
