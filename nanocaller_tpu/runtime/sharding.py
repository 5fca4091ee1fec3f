"""Device mesh + sharding policy.

Scale-out design (SURVEY.md §2.4): genomic regions stream data-parallel
('dp' axis) across chips/hosts while the small CNNs are replicated; the
wide dense layers can additionally be tensor-parallel ('mdl' axis) —
demonstrated in the sharded training step below, where XLA inserts the
all-reduce collectives from NamedSharding annotations alone.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, dp=None):
    """2D mesh (dp, mdl). Defaults to all devices on the dp axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        # favor data parallelism; use a 2-way model axis when n is even
        dp = n if n % 2 else n // 2
    mdl = n // dp
    mesh_devices = np.array(devices[: dp * mdl]).reshape(dp, mdl)
    return Mesh(mesh_devices, ("dp", "mdl"))


def batch_sharding(mesh):
    return NamedSharding(mesh, P("dp"))


def inference_mesh(devices=None):
    """All-dp 1×N serving mesh; None when only one device is present.

    Candidate batches split over 'dp', CNN weights replicated — the
    multi-chip analog of the reference's N CPU inference workers
    (snpCaller.py:213-245, SURVEY.md §2.4 DP row). Used automatically by
    SnpCallerState/IndelCallerState when >1 device is visible.

    Uses LOCAL devices only: under multi-process jax.distributed each
    process holds a different region shard, so a global mesh would make
    device_put assert cross-process data equality. Per-process DP over
    local chips composes with cross-process region sharding.
    """
    devices = list(devices if devices is not None else jax.local_devices())
    if len(devices) < 2:
        return None
    mesh_devices = np.array(devices).reshape(len(devices), 1)
    return Mesh(mesh_devices, ("dp", "mdl"))


def dp_scale(batch_size, mesh):
    """Global device batch for a PER-DEVICE batch size.

    cfg.batch_size is the per-device batch: with an n-way dp mesh the
    global padded batch is n× that, so every device executes the same
    (batch_size, ...) program a single chip would — which makes
    multi-chip inference bit-identical to single-chip by construction
    (tests/test_sharded_inference.py pins this down).
    """
    if mesh is None:
        return batch_size
    return batch_size * mesh.shape["dp"]


def shard_batch(args, mesh, axis=0):
    """device_put arrays over 'dp' on the given axis (default: batch-
    leading); no-op without a mesh. axis=1 serves the cohort-scan
    launch, whose leading axis is the scan trip count."""
    if mesh is None:
        return args
    if axis == 0:
        bshard = batch_sharding(mesh)
    else:
        bshard = NamedSharding(mesh, P(*([None] * axis + ["dp"])))
    return tuple(jax.device_put(a, bshard) for a in args)


def replicated(mesh):
    return NamedSharding(mesh, P())


def snp_param_shardings(mesh, params):
    """TP layout: fc1 output dim and fa input dim sharded over 'mdl';
    everything else replicated. XLA inserts the reduce for the fa matmul."""

    def spec_for(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if name == "params/fc1/kernel":
            return P(None, "mdl")
        if name == "params/fc1/bias":
            return P("mdl")
        if name in ("params/fa/kernel", "params/fc2/kernel"):
            return P("mdl", None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params
    )


def shard_inference_demo(mesh, B=None):
    """Jit the SNP inference path with candidate batches sharded over the
    'dp' axis and replicated weights — the serving-layout for region-
    sharded multi-chip calling (SURVEY.md §2.4 DP row). Executes one
    batch on tiny shapes; used by the driver's multi-chip dry run."""
    from ..models import load_model
    from ..snp_caller import _snp_forward_packed
    from ..pileup.snp_features import WIDTH

    rng = np.random.default_rng(0)
    n_dp = mesh.shape["dp"]
    B = B or max(8, 2 * n_dp)
    R = 32
    params, _ = load_model("snp", "ONT-HG002")
    params = jax.device_put(params, replicated(mesh))
    bshard = batch_sharding(mesh)
    args = (
        jax.device_put(rng.integers(0, 255, (B, R, (WIDTH + 1) // 2))
                       .astype(np.uint8), bshard),
        jax.device_put(rng.random((B, R)) < 0.5, bshard),
        jax.device_put(rng.integers(0, 5, (B, WIDTH)).astype(np.int8), bshard),
        jax.device_put(rng.random((B, WIDTH)) < 0.9, bshard),
        jax.device_put(rng.integers(0, 4, (B,)).astype(np.int8), bshard),
        jax.device_put(np.ones(B, np.float32), bshard),
    )
    probs = _snp_forward_packed(params, *args)
    jax.block_until_ready(probs)
    assert probs.shape == (B, 4)
    return np.asarray(probs)


def shard_train_step_demo(mesh, batch=None):
    """Jit the full SNP training step over the mesh with real dp+tp
    shardings and execute one step on tiny shapes. Used by the driver's
    multi-chip dry run."""
    import optax

    from ..models import SNPModel
    from ..train.snp_train import make_train_step

    rng = np.random.default_rng(0)
    n_dp = mesh.shape["dp"]
    B = max(8, n_dp) * 2
    if batch is None:
        batch = {
            "x": rng.normal(size=(B, 5, 41, 5)).astype(np.float32),
            "ref": np.eye(4, dtype=np.float32)[rng.integers(0, 4, B)],
            "base_labels": np.eye(2, dtype=np.float32)[rng.integers(0, 2, (B, 4))],
            "gt_label": np.eye(2, dtype=np.float32)[rng.integers(0, 2, B)],
        }

    model = SNPModel()
    params = model.init(jax.random.PRNGKey(0), batch["x"][:1], batch["ref"][:1])
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    p_shard = snp_param_shardings(mesh, params)
    b_shard = jax.tree.map(lambda _: batch_sharding(mesh), batch)
    params = jax.device_put(params, p_shard)
    batch = jax.device_put(batch, b_shard)
    opt_state = jax.device_put(opt_state, replicated(mesh))

    step = make_train_step(model, tx)
    step = jax.jit(step, in_shardings=(p_shard, replicated(mesh), b_shard))
    params2, opt_state2, loss = step(params, opt_state, batch)
    jax.block_until_ready((params2, loss))
    return float(loss)
