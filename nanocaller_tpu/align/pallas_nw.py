"""Pallas TPU kernel for the batched NW wavefront DP.

Same DP as align/batch_nw.py (row-scan Gotoh with prefix-max horizontal
state) expressed as a Pallas kernel: the grid runs over DP rows (query
positions), H/V wavefronts persist in VMEM scratch across sequential
grid steps, and each step streams one uint8 traceback row to HBM. The
prefix max is a log₂(W)-step shift-and-max (TPU has no native scan in
kernel bodies).

Interchangeable with the XLA formulation — tests assert identical
traceback matrices; `batch_nw_tb(..., use_pallas=True)` selects it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 28)


def _nw_row_kernel(q_ref, r_ref, tb_ref, H, V,
                   *, match, mismatch, gap_open, gap_extend, W):
    i = pl.program_id(0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    jext = col * gap_extend
    B = r_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        # row 0: horizontal boundary
        H[:] = jnp.where(col == 0, 0, -(gap_open + (col - 1) * gap_extend)
                         ).astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)
        V[:] = jnp.full((B, W), NEG, jnp.int32)
        row0 = jnp.where(col == 0, 0, jnp.where(col == 1, 2, 2 | 8))
        tb_ref[0, :, :] = (row0 * jnp.ones((B, 1), jnp.int32)).astype(jnp.int8)

    @pl.when(i > 0)
    def _row():
        Hprev = H[:]
        Vprev = V[:]
        # dynamic single-lane reads aren't Mosaic-legal; select query
        # char i-1 with a lane mask + reduce instead
        qcols = jax.lax.broadcasted_iota(jnp.int32, q_ref.shape, 1)
        qc = jnp.sum(jnp.where(qcols == i, q_ref[:], 0), axis=1,
                     keepdims=True)  # (B, 1)
        rc = r_ref[:]  # (B, W) lane j holds ref code j-1 (lane 0 dummy)
        is_match = (qc == rc) & (qc < 4)
        sub = jnp.where(is_match, match, mismatch).astype(jnp.int32)
        # diag[j] = Hprev[j-1] + sub[j]  (lane shift right by 1)
        Hshift = _shift_right(Hprev, 1)
        diag = Hshift + sub
        Vnew = jnp.maximum(Hprev - gap_open, Vprev - gap_extend)
        v_ext = (Vprev - gap_extend) > (Hprev - gap_open)
        H0i = -(gap_open + (i - 1) * gap_extend)
        G = jnp.where(col == 0, H0i, jnp.maximum(diag, Vnew))
        came_v = (Vnew > diag) & (col > 0)
        c = G - gap_open + jext
        M = _prefix_max(c, W)
        # Z[j] = M[j-1] - (j-1)*ext for j>=1
        Mm1 = _shift_right(M, 1)
        Z = Mm1 - _shift_right(jext, 1)
        # z_ext[j] = M[j-2] > c[j-1] for j>=2
        z_ext = (_shift_right(M, 2) > _shift_right(c, 1)) & (col >= 2)
        Hnew = jnp.where(col == 0, H0i, jnp.maximum(G, Z))
        came_z = (Z > G) & (col > 0)
        row = jnp.where(came_z, 2, jnp.where(came_v, 1, 0))
        row = jnp.where(col == 0, jnp.where(i > 1, 1 | 4, 1), row)
        row = row | jnp.where(v_ext & (col > 0), 4, 0)
        row = row | jnp.where(z_ext, 8, 0)
        H[:] = Hnew
        V[:] = jnp.where(col == 0, Vprev, Vnew)
        tb_ref[0, :, :] = row.astype(jnp.int8)


def _shift_right(x, k):
    """Lane shift toward higher indices, filling with NEG."""
    if k == 0:
        return x
    W = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    rolled = pltpu.roll(x, shift=k, axis=x.ndim - 1)
    return jnp.where(col >= k, rolled, NEG)


def _prefix_max(c, W):
    M = c
    k = 1
    while k < W:
        M = jnp.maximum(M, _shift_right(M, k))
        k *= 2
    return M


@partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                   "gap_extend", "Q", "W", "interpret"))
def batch_nw_tb_pallas(qcodes, rcodes, match, mismatch, gap_open, gap_extend,
                       Q, W, interpret=False):
    """qcodes (B, Q) int8, rcodes (B, R) int8 with R+1 <= W.

    Returns tb (B, Q+1, W) int8 — identical to batch_nw._batch_nw's tb
    in the first R+1 lanes.
    """
    B = qcodes.shape[0]
    R = rcodes.shape[1]
    # lane j holds ref code j-1; lane 0 dummy; pad up to W
    r_lanes = np.zeros(0)
    rq = jnp.concatenate(
        [jnp.full((B, 1), 4, jnp.int32), rcodes.astype(jnp.int32),
         jnp.full((B, W - R - 1), 4, jnp.int32)], axis=1)
    # program i>0 reads query char i-1 → prepend dummy column
    qp = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), qcodes.astype(jnp.int32)], axis=1)

    kernel = partial(_nw_row_kernel, match=match, mismatch=mismatch,
                     gap_open=gap_open, gap_extend=gap_extend, W=W)
    # tb rows stream out as (1, B, W) blocks — the TPU lowering requires
    # the last two block dims be tile-aligned or full, so the row axis
    # leads; transposed to (B, Q+1, W) afterwards on-device.
    tb_rows = pl.pallas_call(
        kernel,
        grid=(Q + 1,),
        in_specs=[
            pl.BlockSpec((B, Q + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q + 1, B, W), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((B, W), jnp.int32),
            pltpu.VMEM((B, W), jnp.int32),
        ],
        interpret=interpret,
    )(qp, rq)
    return jnp.transpose(tb_rows, (1, 0, 2))
