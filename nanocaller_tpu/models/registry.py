"""Named model registry: name → imported JAX weight pack.

Mirrors the reference's snp_model_dict / indel_model_dict name surface
(snpCaller.py:16-34, indelCaller.py:17-24) but resolves to in-repo npz
packs produced by tools/convert_weights.py. The '.coverage' sidecar
(training depth scalar, read at snpCaller.py:48-53) rides along.
"""

from __future__ import annotations

import os

from .weights import params_from_npz

PARAMS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "params")

SNP_MODEL_NAMES = [
    "NanoCaller1", "NanoCaller2", "NanoCaller3",
    "ONT-HG001", "ONT-HG001_GP2.3.8", "ONT-HG001_GP2.3.8-4.2.2",
    "ONT-HG001-4_GP4.2.2", "ONT-HG002", "ONT-HG002_GP4.2.2_v3.3.2",
    "ONT-HG002_GP2.3.4_v3.3.2", "ONT-HG002_GP2.3.4_v4.2.1",
    "ONT-HG002_r10.3", "ONT-HG002_bonito",
    "CCS-HG001", "CCS-HG002", "CCS-HG001-4", "CLR-HG002", "haploid",
]
INDEL_MODEL_NAMES = [
    "NanoCaller1", "NanoCaller3", "ONT-HG001", "ONT-HG002",
    "CCS-HG001", "CCS-HG002", "haploid",
]

# default training coverage when no sidecar exists; the reference
# hardcodes 30 for the haploid model (snpCaller.py:73)
HAPLOID_TRAIN_COVERAGE = 30.0


def _pack_path(kind, name):
    return os.path.join(PARAMS_DIR, "%s_%s.npz" % (kind, name))


def available_models(kind="snp"):
    names = SNP_MODEL_NAMES if kind == "snp" else INDEL_MODEL_NAMES
    return [n for n in names if os.path.exists(_pack_path(kind, n))]


def load_model(kind, name):
    """Returns (params, train_coverage). `name` may also be a direct
    path to an .npz pack (the reference accepts checkpoint dirs the same
    way, snpCaller.py:41-43)."""
    if os.path.exists(name) and name.endswith(".npz"):
        path = name
    else:
        path = _pack_path(kind, name)
        if not os.path.exists(path):
            raise ValueError(
                "unknown %s model %r (available: %s)"
                % (kind, name, ", ".join(available_models(kind)))
            )
    params = params_from_npz(path)
    cov_path = path.replace(".npz", ".coverage")
    if os.path.exists(cov_path):
        with open(cov_path) as fh:
            train_coverage = float(fh.readline().strip())
    else:
        train_coverage = 0.0
    return params, train_coverage
