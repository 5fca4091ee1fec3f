"""Indel model training.

Loss parity with misc/training/model_architect_indel.py: 4-class softmax
CE over {hom-ref, hom-alt, het-ref, het-alt} + 1e-5 × L2 on kernels
(the reference also computes a focal-loss variant it never uses,
:112-126 — omitted). Input (B,15,128,2) = hap0/hap1/all tensors stacked
on rows; the reader-side count→frequency-minus-ref normalization
(model_run_indels.py:229-232) is already how our inference tensors are
built, so features are shared between train and serve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

L2_GAMMA = 1e-5


def indel_loss(model, params, batch, l2_gamma=L2_GAMMA):
    """batch: x (B,15,128,2), label (B,4) one-hot genotype class."""
    probs = model.apply(params, batch["x"])
    logp = jnp.log(jnp.clip(probs, 1e-9, 1.0))
    ce = -(batch["label"] * logp).sum(-1).mean()

    def kernel_l2(path, leaf):
        is_kernel = any(getattr(p, "key", None) == "kernel" for p in path)
        return jnp.sum(leaf * leaf) / 2 if is_kernel else 0.0

    reg = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map_with_path(kernel_l2, params), 0.0)
    return ce + l2_gamma * reg


def make_indel_train_step(model, tx):
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: indel_loss(model, p, batch))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def label_candidates_from_truth(batch, truth_indels, window=10):
    """Assign 4-class labels to an IndelBatch from a truth indel map.

    truth_indels: {pos1: gt_class} with gt_class ∈ {1: hom-alt,
    2: het-ref, 3: het-alt}; candidates with no truth indel within
    ±window are hom-ref (0). Mirrors the candidate-class assignment idea
    of misc/training/generate_indel_pileups.py:179-183.
    """
    import numpy as np

    labels = np.zeros(len(batch), np.int64)
    tpos = np.array(sorted(truth_indels), dtype=np.int64)
    for j, p in enumerate(batch.pos):
        if len(tpos):
            i = np.searchsorted(tpos, p)
            for k in (i - 1, i):
                if 0 <= k < len(tpos) and abs(int(tpos[k]) - p) <= window:
                    labels[j] = truth_indels[int(tpos[k])]
                    break
    return labels


def train_indel_model(x, labels, out_dir, *, epochs=50, lr=1e-3,
                      batch_size=64, seed=0, init_params=None, log=print):
    """x: (N,15,128,2) float32; labels: (N,) int 0..3."""
    import os

    import numpy as np

    from ..models import IndelModel
    from ..models.weights import params_to_npz

    model = IndelModel()
    rng = np.random.default_rng(seed)
    if init_params is None:
        params = model.init(jax.random.PRNGKey(seed), x[:1].astype(np.float32))
    else:
        params = init_params
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step = jax.jit(make_indel_train_step(model, tx))
    os.makedirs(out_dir, exist_ok=True)
    history = []
    onehot = np.eye(4, dtype=np.float32)
    for epoch in range(epochs):
        order = rng.permutation(len(labels))
        losses = []
        for lo in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[lo : lo + batch_size]
            batch = {"x": x[idx].astype(np.float32), "label": onehot[labels[idx]]}
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        ckpt = os.path.join(out_dir, "indel_model-%d.npz" % (epoch + 1))
        params_to_npz(ckpt, jax.tree.map(np.asarray, params))
        history.append({"epoch": epoch + 1,
                        "loss": float(np.mean(losses)) if losses else None,
                        "ckpt": ckpt})
        log("epoch %d loss %.4f" % (epoch + 1, history[-1]["loss"] or 0.0))
    return params, history
