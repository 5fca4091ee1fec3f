"""SNP model training: loss + optax train step.

Loss parity with the reference TF1 trainer
(misc/training/model_architect.py:130-146): mean softmax CE for each of
the four per-base heads + the GT head (weight 1.0) + 1e-3 × L2 on
kernel weights (tf.nn.l2_loss = sum(x²)/2, kernels only, biases
excluded).

One deliberate deviation, documented: the reference's training graph
concatenates per-base LOGITS into the GT branch
(misc/training/model_architect.py:54) while its inference model
concatenates softmax PROBABILITIES (nanocaller_src/model_architect.py:61)
— the two nets disagree. We train the inference wiring so train and
serve are the same function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

L2_GAMMA = 1e-3


def snp_loss(model, params, batch, l2_gamma=L2_GAMMA):
    """batch: dict with x (B,5,41,5), ref (B,4), base_labels (B,4,2),
    gt_label (B,2)."""
    head_logits, gt_logits = model.apply(params, batch["x"], batch["ref"],
                                         return_logits=True)
    ce = optax.softmax_cross_entropy
    cost = ce(gt_logits, batch["gt_label"]).mean()
    for i in range(4):
        cost = cost + ce(head_logits[:, i], batch["base_labels"][:, i]).mean()

    def kernel_l2(path, leaf):
        is_kernel = any(getattr(p, "key", None) == "kernel" for p in path)
        return jnp.sum(leaf * leaf) / 2 if is_kernel else 0.0

    reg = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map_with_path(kernel_l2, params),
        0.0,
    )
    return cost + l2_gamma * reg


def make_train_step(model, tx):
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: snp_loss(model, p, batch))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def train_snp_model(train_examples, val_examples, out_dir, *, epochs=100,
                    lr=1e-3, batch_size=128, seed=0, init_params=None,
                    log=print):
    """Epoch loop mirroring the reference trainer's shape
    (model_run.py:93-186: per-epoch validation + checkpoint-per-epoch,
    retrain-from-checkpoint via init_params). Checkpoints are saved as
    npz packs directly loadable by models/registry.load_model."""
    import os

    import numpy as np

    from ..models import SNPModel
    from ..models.weights import params_to_npz
    from .data import batches_from_examples

    model = SNPModel()
    rng = np.random.default_rng(seed)
    if init_params is None:
        ex0 = next(batches_from_examples(train_examples, 2, rng))
        params = model.init(jax.random.PRNGKey(seed), ex0["x"], ex0["ref"])
    else:
        params = init_params
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, tx))

    os.makedirs(out_dir, exist_ok=True)
    history = []
    for epoch in range(epochs):
        losses = []
        for batch in batches_from_examples(train_examples, batch_size, rng):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        val_acc = None
        if val_examples is not None and len(val_examples["gt"]):
            n_ok = n_tot = 0
            for batch in batches_from_examples(
                    val_examples, min(batch_size, len(val_examples["gt"])),
                    np.random.default_rng(0)):
                n_ok += int(joint_accuracy(model, params, batch))
                n_tot += len(batch["gt_label"])
            val_acc = n_ok / max(1, n_tot)
        ckpt = os.path.join(out_dir, "snp_model-%d.npz" % (epoch + 1))
        params_to_npz(ckpt, jax.tree.map(np.asarray, params))
        history.append({"epoch": epoch + 1,
                        "loss": float(np.mean(losses)) if losses else None,
                        "val_acc": val_acc, "ckpt": ckpt})
        log("epoch %d loss %.4f val_acc %s" % (
            epoch + 1, history[-1]["loss"] or 0.0, val_acc))
    return params, history


def joint_accuracy(model, params, batch):
    """The reference's 5-head joint accuracy metric
    (misc/training/model_architect.py:172-175)."""
    head_logits, gt_logits = model.apply(params, batch["x"], batch["ref"],
                                         return_logits=True)
    ok = jnp.argmax(gt_logits, -1) == jnp.argmax(batch["gt_label"], -1)
    for i in range(4):
        ok &= jnp.argmax(head_logits[:, i], -1) == jnp.argmax(batch["base_labels"][:, i], -1)
    return ok.sum()
