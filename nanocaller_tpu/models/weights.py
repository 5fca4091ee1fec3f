"""Weight storage and import.

Runtime weights live as flat .npz archives ("layer/kernel" → array) that
map 1:1 onto the flax param trees of models/snp.py & models/indel.py.
The one-time conversion from the reference's released TF checkpoints /
Keras .h5 files lives in tools/convert_weights.py (TF is only needed
there, never at inference time).
"""

from __future__ import annotations

import numpy as np


def params_from_npz(path):
    """Load a flat npz into a flax params dict {'params': {layer: {k: v}}}."""
    flat = np.load(path)
    tree = {}
    for key in flat.files:
        layer, var = key.rsplit("/", 1)
        tree.setdefault(layer, {})[var] = np.asarray(flat[key], dtype=np.float32)
    return {"params": tree}


def params_to_npz(path, params):
    flat = {}
    for layer, vars_ in params["params"].items():
        for var, val in vars_.items():
            flat["%s/%s" % (layer, var)] = np.asarray(val)
    np.savez_compressed(path, **flat)
    return path


def validate_params(params, model, example_inputs):
    """Shape-check params against a freshly initialized model tree."""
    import jax

    ref = model.init(jax.random.PRNGKey(0), *example_inputs)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    if ref_shapes != got_shapes:
        raise ValueError(
            "param tree mismatch:\nwant %s\ngot  %s" % (ref_shapes, got_shapes)
        )
    return params
