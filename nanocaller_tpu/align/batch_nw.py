"""Batched affine NW on device (the north star's realignment kernel).

Thousands of (query, ref) pairs score in one launch: the DP runs row by
row over the query axis, vectorized across the batch and ref lanes, with
the horizontal (gap-in-query) state computed per row by a prefix-max
scan — the same exact-for-affine-costs identity as align/nw.py, so the
traceback matrices (and therefore cigars) are bit-identical to the numpy
oracle. Traceback itself is a cheap host walk over the returned uint8
matrices.

Used by the indel path to replace per-read numpy DP (and, in the
reference, one MUSCLE subprocess per candidate-haplotype —
generate_indel_pileups.py:30). The pure-JAX formulation compiles for TPU
via XLA (cummax lowers to a log-depth scan); see align/pallas_nw.py for
the hand-written Pallas variant of the scoring loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .nw import _CHAR_CODE

NEG = jnp.int32(-(1 << 28))


@partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                   "gap_extend", "Q", "R"))
def _batch_nw(qcodes, rcodes, match, mismatch, gap_open, gap_extend, Q, R):
    """qcodes (B, Q) int8, rcodes (B, R) int8 (4 = pad/other).

    Returns (H_final (B, R+1) int32 — last row only, tb (B, Q+1, R+1)
    uint8). Full scores for any (qlen, rlen) are recovered by reading
    tb-driven tracebacks; per-pair final scores at (qlen, rlen) are
    returned separately by the host wrapper via the stored rows trick
    (we also return all H rows' boundary? no — the traceback does not
    need scores, and callers use cigars only).
    """
    B = qcodes.shape[0]
    jext = jnp.arange(R + 1, dtype=jnp.int32) * gap_extend

    H0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         jnp.broadcast_to(-(gap_open + jext[None, :-1]), (B, R))], axis=1)
    V0 = jnp.full((B, R + 1), NEG, jnp.int32)

    tb0 = jnp.zeros((B, R + 1), jnp.uint8)
    tb0 = tb0.at[:, 1].set(2)
    tb0 = tb0.at[:, 2:].set(2 | 8)

    rj = rcodes.astype(jnp.int32)  # (B, R)

    def row_step(carry, qi_codes_and_i):
        Hprev, Vprev, i = carry
        qc = qi_codes_and_i  # (B,) codes of query char i-1
        is_match = (qc[:, None] == rj) & (qc[:, None] < 4)
        sub = jnp.where(is_match, match, mismatch).astype(jnp.int32)
        diag = Hprev[:, :-1] + sub
        Vnew = jnp.maximum(Hprev[:, 1:] - gap_open, Vprev[:, 1:] - gap_extend)
        v_ext = (Vprev[:, 1:] - gap_extend) > (Hprev[:, 1:] - gap_open)
        H0i = -(gap_open + (i - 1) * gap_extend)
        G = jnp.concatenate(
            [jnp.full((B, 1), H0i, jnp.int32), jnp.maximum(diag, Vnew)], axis=1)
        came_v = Vnew > diag
        c = G - gap_open + jext[None, :]
        M = jax.lax.cummax(c, axis=1)
        Z = M[:, :-1] - jext[None, :-1]
        z_ext = jnp.concatenate(
            [jnp.zeros((B, 1), bool), M[:, :-2] > c[:, 1:-1]], axis=1)
        Hrow_tail = jnp.maximum(G[:, 1:], Z)
        came_z = Z > G[:, 1:]
        H = jnp.concatenate([jnp.full((B, 1), H0i, jnp.int32), Hrow_tail], axis=1)
        V = jnp.concatenate([Vprev[:, :1], Vnew], axis=1)
        row = jnp.where(came_z, 2, jnp.where(came_v, 1, 0)).astype(jnp.uint8)
        row |= (v_ext << 2).astype(jnp.uint8)
        row |= (z_ext << 3).astype(jnp.uint8)
        head = jnp.broadcast_to(
            jnp.where(i > 1, jnp.uint8(1 | 4), jnp.uint8(1)), (B, 1))
        tb_row = jnp.concatenate([head, row], axis=1)
        return (H, V, i + 1), (tb_row, H)

    qc_seq = qcodes.astype(jnp.int32).T  # (Q, B)
    (_, _, _), (tb_rows, H_rows) = jax.lax.scan(
        row_step, (H0, V0, jnp.int32(1)), qc_seq)
    tb = jnp.concatenate([tb0[:, None, :],
                          jnp.transpose(tb_rows, (1, 0, 2))], axis=1)
    H_all = jnp.concatenate([H0[:, None, :],
                             jnp.transpose(H_rows, (1, 0, 2))], axis=1)
    return H_all, tb


def _traceback_matrix(tb, qlen, rlen):
    """Host traceback over one uint8 matrix (same walk as nw.py)."""
    i, j = int(qlen), int(rlen)
    ops = []
    state = 0
    while i > 0 or j > 0:
        cell = int(tb[i, j])
        if state == 0:
            if j == 0:
                state = 1
                continue
            if i == 0:
                state = 2
                continue
            src = cell & 3
            if src == 0:
                ops.append(("d", i, j))
                i -= 1
                j -= 1
            else:
                state = src
        elif state == 1:
            ops.append(("i", i, j))
            ext = cell & 4
            i -= 1
            if not ext:
                state = 0
        else:
            ops.append(("z", i, j))
            ext = cell & 8
            j -= 1
            if not ext:
                state = 0
    ops.reverse()
    return ops


@partial(jax.jit, static_argnames=("T",))
def _walk_device(tb, qlens, rlens, T):
    """Device-side traceback walk — the same state machine as
    _traceback_matrix, vectorized over the batch as a fixed-length scan.

    Motivation: over the axon tunnel the (B, Q+1, W) traceback matrix
    transfer dominates the whole alignment stage (measured 444 ms for
    12.6 MB at B=256 192×192 vs ≤4 ms device compute); the walk result
    is ~100× smaller. Emits op codes 0=none, 1=diag, 2=ins, 3=del in
    end→start order, (B, T) int8; T must be ≥ 2·(Q+R)+2 (each active
    step either emits or switches state, never two non-emitting steps
    in a row)."""
    B = tb.shape[0]
    bidx = jnp.arange(B)

    def step(carry, _):
        i, j, state = carry
        cell = tb[bidx, i, j].astype(jnp.int32)
        active = (i > 0) | (j > 0)
        at0 = (state == 0) & active
        force1 = at0 & (j == 0)
        force2 = at0 & (i == 0) & (j > 0)
        inner = at0 & (i > 0) & (j > 0)
        src = cell & 3
        diag = inner & (src == 0)
        tost = inner & (src != 0)
        s1 = (state == 1) & active
        s2 = (state == 2) & active
        emit = jnp.where(diag, 1, jnp.where(s1, 2, jnp.where(s2, 3, 0)))
        ni = i - (diag | s1).astype(i.dtype)
        nj = j - (diag | s2).astype(j.dtype)
        ns = jnp.where(force1, 1,
             jnp.where(force2, 2,
             jnp.where(tost, src,
             jnp.where(s1 & ((cell & 4) == 0), 0,
             jnp.where(s2 & ((cell & 8) == 0), 0, state)))))
        return (ni, nj, ns), emit.astype(jnp.int8)

    init = (qlens.astype(jnp.int32), rlens.astype(jnp.int32),
            jnp.zeros(B, jnp.int32))
    _, emits = jax.lax.scan(step, init, None, length=T)
    return emits.T


class BatchAligner:
    """Pads string pairs into fixed (Q, R) buckets, runs the device DP,
    and walks tracebacks on device (op-code stream) or host (full tb
    matrix). Produces cigars identical to nw.nw_align (asserted by
    tests)."""

    BUCKETS = (64, 128, 192, 256, 320, 512)

    def __init__(self, match=20, mismatch=-10, gap_open=9, gap_extend=1,
                 use_pallas=None, device_walk=None):
        self.params = (match, mismatch, gap_open, gap_extend)
        # On the real chip the DP compute (pallas or lax.scan) is ≤4 ms
        # at B=256 192×192 — the tb-matrix transfer is what costs (444 ms
        # over the tunnel). device_walk replaces it with a ~100× smaller
        # op stream; pallas stays default-on for the DP itself.
        if use_pallas is None:
            import jax

            use_pallas = jax.default_backend() not in ("cpu",)
        if device_walk is None:
            import jax

            device_walk = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        self.device_walk = device_walk

    def _bucket(self, n):
        for b in self.BUCKETS:
            if n <= b:
                return b
        return None

    def align_many(self, pairs):
        """pairs: list of (query, ref) strings → list of cigars
        (same op/length convention as nw.nw_align)."""
        from .nw import nw_align

        out = [None] * len(pairs)
        groups = {}
        for k, (q, r) in enumerate(pairs):
            bq = self._bucket(len(q))
            br = self._bucket(len(r))
            if bq is None or br is None or len(q) == 0 or len(r) == 0:
                out[k] = nw_align(q, r, match=self.params[0],
                                  mismatch=self.params[1],
                                  gap_open=self.params[2],
                                  gap_extend=self.params[3])[1]
            else:
                groups.setdefault((bq, br), []).append(k)
        for (Q, R), idxs in groups.items():
            B = len(idxs)
            qcodes = np.full((B, Q), 4, np.int8)
            rcodes = np.full((B, R), 4, np.int8)
            qlens = np.zeros(B, np.int64)
            rlens = np.zeros(B, np.int64)
            for b, k in enumerate(idxs):
                q, r = pairs[k]
                qa = _CHAR_CODE[np.frombuffer(q.encode(), dtype=np.uint8)]
                ra = _CHAR_CODE[np.frombuffer(r.encode(), dtype=np.uint8)]
                qcodes[b, : len(qa)] = qa
                rcodes[b, : len(ra)] = ra
                qlens[b] = len(qa)
                rlens[b] = len(ra)
            m, x, go, ge = self.params
            if self.use_pallas:
                from .pallas_nw import batch_nw_tb_pallas

                W = max(128, -(-(R + 1) // 128) * 128)
                tb = batch_nw_tb_pallas(qcodes, rcodes, m, x, go, ge, Q, W)
            else:
                _, tb = _batch_nw(qcodes, rcodes, m, x, go, ge, Q, R)
            if self.device_walk:
                # walk on device, transfer only the op-code stream
                T = 2 * (Q + R) + 2
                em = np.asarray(_walk_device(tb, jnp.asarray(qlens),
                                             jnp.asarray(rlens), T))
                for b, k in enumerate(idxs):
                    codes = em[b]
                    codes = codes[codes > 0][::-1]
                    walk = [("diz"[c - 1], 0, 0) for c in codes]
                    out[k] = refine_diag_ops(_walk_to_cigar(walk), *pairs[k])
            else:
                tb = np.asarray(tb)
                for b, k in enumerate(idxs):
                    walk = _traceback_matrix(tb[b], qlens[b], rlens[b])
                    out[k] = refine_diag_ops(_walk_to_cigar(walk), *pairs[k])
        return out


def _walk_to_cigar(walk):
    cigar = []
    for kind, i, j in walk:
        if kind == "d":
            op = -1  # placeholder, refined below by caller comparing codes
        elif kind == "i":
            op = 1
        else:
            op = 2
        if cigar and cigar[-1][0] == op:
            cigar[-1][1] += 1
        else:
            cigar.append([op, 1])
    return [(op, l) for op, l in cigar]


def refine_diag_ops(cigar, query, ref):
    """Replace diagonal placeholder ops (-1) with '='(7)/'X'(8) runs by
    comparing the actual characters."""
    out = []
    qi = ri = 0
    for op, l in cigar:
        if op == -1:
            run_op = None
            run_len = 0
            for k in range(l):
                a, b = query[qi + k], ref[ri + k]
                o = 7 if (a == b and a in "ACGT") else 8
                if o == run_op:
                    run_len += 1
                else:
                    if run_op is not None:
                        out.append((run_op, run_len))
                    run_op, run_len = o, 1
            out.append((run_op, run_len))
            qi += l
            ri += l
        else:
            out.append((op, l))
            if op == 1:
                qi += l
            else:
                ri += l
    return out
