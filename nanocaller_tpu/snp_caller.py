"""SNP calling: batched TPU inference + genotype decode + VCF output.

Pipeline parity with snpCaller.py:57-287 — coverage normalization
(:93-96), the per-base-probability genotype decision tree (:113-163),
haploid decode (:166-198), Phred formulas incl. the haploid ×100 scale
(:192), VCF text formats byte-for-byte, and the two-file output contract
({prefix}.unfiltered.snps.vcf.gz + PASS-only {prefix}.snps.vcf.gz).

TPU-first differences: the pileup tensor is assembled on-device from
packed int8 code arrays (one-hot einsum → MXU), inference runs in fixed
padded batches under a single jit, and candidates from a whole chunk go
through in a few launches rather than Python loops of 1000.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .io.vcf import VcfWriter, standard_snp_header, view_filter
from .models import HaploidSNPModel, SNPModel, load_model
from .models.registry import HAPLOID_TRAIN_COVERAGE
from .pileup.snp_features import (BAND_SCHEDULES, CENTER, WIDTH, SnpBatch,
                                  get_snp_candidates)

NUM_TO_BASE = "AGTC"  # snpCaller.py:14


def _phred(p, cap=99, scale=10, eps=1e-10):
    """min(cap, -scale*log10(eps + 1 - p)) with the reference's effective
    NaN behavior: float32 softmax can give p marginally above 1, where
    numpy log10 yields NaN and Python's min(cap, nan) returns cap
    (snpCaller.py:135 et al.) — so out-of-domain clamps to cap."""
    x = eps + 1.0 - float(p)
    if x <= 0:
        return float(cap)
    return min(cap, -scale * math.log10(x))


def pack_codes(codes):
    """Nibble-pack an int8 code matrix (B, R, W) → uint8 (B, R, ceil(W/2)).

    Codes are 0..4 (3 bits); packing halves the host→device transfer,
    which is the steady-state bottleneck of the inference pipeline (the
    CNN itself runs ~3 orders of magnitude faster than the link).
    """
    B, R, W = codes.shape
    if W % 2:
        codes = np.concatenate(
            [codes, np.zeros((B, R, 1), codes.dtype)], axis=-1)
    u = codes.astype(np.uint8)
    return (u[:, :, 0::2] | (u[:, :, 1::2] << 4)).copy()


@partial(jax.jit, static_argnames=("haploid", "width"))
def _snp_forward_packed(params, packed, read_mask, col_ref, col_valid,
                        center_ref, norm_scale, haploid=False, width=41):
    """Unpack nibble codes on-device, then assemble + run the CNN."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    codes = jnp.stack([lo, hi], axis=-1).reshape(
        packed.shape[0], packed.shape[1], -1)[:, :, :width]
    return _snp_forward_dense(params, codes, read_mask, col_ref, col_valid,
                              center_ref, norm_scale, haploid)


@partial(jax.jit, static_argnames=("haploid",))
def _snp_forward(params, codes, read_mask, col_ref, col_valid, center_ref,
                 norm_scale, haploid=False):
    return _snp_forward_dense(params, codes, read_mask, col_ref, col_valid,
                              center_ref, norm_scale, haploid)


def _snp_forward_dense(params, codes, read_mask, col_ref, col_valid,
                       center_ref, norm_scale, haploid=False):
    """Assemble pileup matrices on-device and run the SNP CNN.

    codes: (B, R, 41) int8; read_mask: (B, R) bool; col_ref: (B,41) int8;
    col_valid: (B,41) bool; center_ref: (B,) int8; norm_scale: (B,) f32.
    Returns (B,4) per-base presence probabilities (diploid) or (B,4)
    softmax over bases (haploid).
    """
    codes = codes.astype(jnp.int32)
    center = codes[:, :, CENTER]
    grp = jax.nn.one_hot(center, 5, dtype=jnp.float32)[..., :4]
    grp = grp * read_mask[..., None]
    oh = jax.nn.one_hot(codes, 5, dtype=jnp.float32)  # (B,R,41,5)
    mat = jnp.einsum("brg,brwc->bgwc", grp, oh,
                     preferred_element_type=jnp.float32)[..., :4]
    ref_eq = jax.nn.one_hot(center_ref.astype(jnp.int32), 4, dtype=jnp.float32)
    ch4 = ref_eq[:, :, None] * col_valid[:, None, :]
    mat = jnp.concatenate([mat, ch4[..., None]], axis=-1)  # (B,4,41,5)
    total_ref = jax.nn.one_hot(col_ref.astype(jnp.int32), 5, dtype=jnp.float32)
    total_ref = total_ref.at[..., 4].set(0.0)
    flip = 1.0 - 2.0 * total_ref
    x = jnp.concatenate([total_ref[:, None], mat * flip[:, None]], axis=1)
    # coverage normalization (snpCaller.py:93-96): rows 1-4, channels 0-3
    scale = norm_scale[:, None, None, None]
    x = jnp.concatenate(
        [x[:, :1], x[:, 1:].at[..., :4].multiply(scale)], axis=1
    )
    ref_oh = jax.nn.one_hot(center_ref.astype(jnp.int32), 4, dtype=jnp.float32)
    if haploid:
        return HaploidSNPModel().apply(params, x, ref_oh)
    probs, gt = SNPModel().apply(params, x, ref_oh)
    return probs[:, :, 1]


def _pow2_pad(n, lo=256):
    """Smallest power-of-two bucket ≥ n (bounds jit recompiles across
    chunks: steady-state runs hit one or two buckets)."""
    b = lo
    while b < n:
        b *= 2
    return b


def _bucket15(n, lo=1024):
    """Half-octave buckets (1024, 1536, 2048, 3072, ...): ≤33% pad waste
    at ~2 jit shapes per octave."""
    b = lo
    while True:
        if n <= b:
            return b
        if n <= b * 3 // 2:
            return b * 3 // 2
        b *= 2


def _bucket_q(n, lo=1024):
    """Quarter-octave buckets (1, 1.25, 1.5, 1.75)×2^k: ≤25% pad waste
    on the fused event array — the term that dominates the deduplicated
    transfer — at ~4 jit shapes per octave."""
    b = lo
    while True:
        for num in (4, 5, 6, 7):
            if n <= b * num // 4:
                return b * num // 4
        b *= 2


class _CompileAwareBucket:
    """Compile-aware size buckets: reuse an already-chosen bucket when
    one fits within `ratio`× of the requested size; otherwise take the
    fine bucket and remember it. Axon remote compiles cost 20-40 s each
    with no usable compile cache, so every distinct jit shape is ~30 s
    of wall — runs must converge to one or two shape combos. Wire-cost
    dims (the event array) use a tight ratio; HBM-only dims (table
    rows/columns) a generous one."""

    def __init__(self, fine_fn, lo, ratio_num, ratio_den=1):
        self.fine = fine_fn
        self.lo = lo
        self.num = ratio_num
        self.den = ratio_den
        self.used = set()

    def __call__(self, n):
        n = max(n, 1)
        fits = [b for b in self.used if n <= b <= n * self.num // self.den]
        if fits:
            return min(fits)
        b = self.fine(n, self.lo)
        self.used.add(b)
        return b


_bucket_ev = _CompileAwareBucket(_bucket_q, 1024, 7, 4)  # ≤1.75× wire pad
_bucket_sites = _CompileAwareBucket(_pow2_pad, 256, 4)  # table rows (HBM)
_bucket_reads = _CompileAwareBucket(_pow2_pad, 256, 4)  # table cols (HBM)
_bucket_nbr = _CompileAwareBucket(_pow2_pad, 256, 4)  # nbr arrays (small)
_bucket_bits = _CompileAwareBucket(_bucket_q, 1024, 7, 4)  # span bitmask bytes


def _build_obs_tables_impl(read_lo, read_hi, site_major, site_minor,
                           minor_bits, exc_packed,
                           exc_indptr, e_real, hole_site, hole_rid,
                           s_pad, n_pad):
    """Reconstruct the dense (site × read) observation tables from the
    interval + exception wire format (pileup.snp_features
    SnpChunkFeatures docstring):

    - obs_mask[s, r]: read r observes site s ⇔ read_lo[r] ≤ s ≤
      read_hi[r] minus the rare (hole_site, hole_rid) pairs;
    - table[s, r]: the observed code — the site's TOP-1 code by
      default, the TOP-2 code where the per-read span bitmask says so
      (bit = span_start[r] + s - read_lo[r]; span_start recomputed here
      by a cumsum over the span lengths), overwritten by the exception
      CSR scatter for the ~8% residue. Union sites are variant-enriched,
      so the biallelic signal rides the bitmask at 1 bit/cell instead of
      16 per observation.

    Row s_pad is the trash row for padded/invalid lookups (mask False,
    code 4 = the reference's 'other/missing',
    generate_SNP_pileups.py:104). Padded reads carry lo=1 > hi=0 (empty
    span); padded holes point at the trash row."""
    si = jnp.arange(s_pad + 1, dtype=jnp.int32)[:, None]
    read_lo = read_lo.astype(jnp.int32)
    read_hi = read_hi.astype(jnp.int32)
    obs_mask = (si >= read_lo[None, :]) & (si <= read_hi[None, :]) \
        & (si < s_pad)
    if hole_site.shape[0]:
        obs_mask = obs_mask.at[
            jnp.clip(hole_site.astype(jnp.int32), 0, s_pad),
            jnp.clip(hole_rid.astype(jnp.int32), 0, n_pad - 1)].set(False)
    major_ext = jnp.concatenate(
        [site_major, jnp.full((1,), 4, jnp.int8)])[:, None]
    minor_ext = jnp.concatenate(
        [site_minor, jnp.full((1,), 4, jnp.int8)])[:, None]
    if minor_bits.shape[0]:
        spans = jnp.maximum(read_hi - read_lo + 1, 0)
        span_start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(spans)[:-1]])
        T = minor_bits.shape[0] * 8
        bit_idx = jnp.clip(span_start[None, :] + (si - read_lo[None, :]),
                           0, T - 1)
        byte = minor_bits[bit_idx >> 3].astype(jnp.int32)
        minor = ((byte >> (bit_idx & 7)) & 1).astype(bool)
        cell_code = jnp.where(minor, minor_ext, major_ext)
    else:
        cell_code = jnp.broadcast_to(major_ext, (s_pad + 1, n_pad))
    table = jnp.where(obs_mask, cell_code, jnp.int8(4))
    E = exc_packed.shape[0]
    ev = exc_packed.astype(jnp.int32)
    e = jnp.arange(E, dtype=jnp.int32)
    site = jnp.searchsorted(exc_indptr.astype(jnp.int32), e,
                            side="right").astype(jnp.int32) - 1
    site = jnp.where(e < e_real, jnp.clip(site, 0, s_pad - 1), s_pad)
    rid = jnp.clip(ev >> 3, 0, n_pad - 1)
    code = (ev & 7).astype(jnp.int8)
    table = table.at[site, rid].set(code)
    return obs_mask, table


def _build_chunk_state_impl(read_lo, read_hi, site_major, site_minor,
                            minor_bits, exc_packed,
                            exc_indptr, e_real, hole_site, hole_rid,
                            s_pad, n_pad, R):
    """Once-per-chunk device build: obs/code tables + the per-site read
    list table (first R covering read ids, ascending + depth). Candidate
    batches then reduce to cheap row gathers."""
    obs_mask, table = _build_obs_tables_impl(
        read_lo, read_hi, site_major, site_minor, minor_bits,
        exc_packed, exc_indptr, e_real,
        hole_site, hole_rid, s_pad, n_pad)
    rid_table, depth = _rid_matrix(obs_mask, R)
    return table, rid_table, depth


_build_chunk_state = partial(
    jax.jit, static_argnames=("s_pad", "n_pad", "R"))(
    _build_chunk_state_impl)


def _rid_matrix(obs_rows, R):
    """First R observing read ids (ascending) per row of an obs-mask
    block + per-row observation depth. Equals the CSR row prefix the
    explicit-observation format shipped: covering reads in ascending id
    order. Run ONCE per chunk over all site rows (_build_obs_tables);
    per-batch kernels just gather the rows they need."""
    rank = jnp.cumsum(obs_rows.astype(jnp.int32), axis=1)
    depth = rank[:, -1] if obs_rows.shape[1] else jnp.zeros(
        obs_rows.shape[0], jnp.int32)
    slot = jnp.where(obs_rows & (rank <= R), rank - 1, R)
    B, N = obs_rows.shape
    rid_mat = jnp.zeros((B, R + 1), jnp.int32)
    rid_mat = rid_mat.at[jnp.arange(B)[:, None], slot].set(
        jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N)),
        mode="drop")
    return rid_mat[:, :R], depth


def _device_select_neighbors(cand_site, cand_pos, nbr_pos, nbr_union,
                             seq_type):
    """On-device twin of pileup.snp_features.select_neighbors: band-quota
    neighbor selection (generate_SNP_pileups.py:6-101) from the chunk's
    neighbor-site positions, mapped to union-site indices. Exact-match
    parity with the host function is pinned in tests/test_snp_dedup.py.

    Returns (B, 41) int32 union-site indices, -1 padding, center column
    = cand_site. Shipping nbr_pos/nbr_union (O(sites)) instead of the
    per-candidate (B, 41) matrix removes the last per-candidate×41 term
    from the host→device transfer."""
    sched = BAND_SCHEDULES[seq_type]
    B = cand_site.shape[0]
    M = nbr_union.shape[0]
    # one extra trash column absorbs invalid-slot scatters
    soc = jnp.full((B, WIDTH + 1), -1, jnp.int32)
    for side in ("left", "right"):
        sel_parts, val_parts = [], []
        for lo_off, hi_off, k, take in sched[side]:
            i0 = jnp.searchsorted(nbr_pos, cand_pos + lo_off, side="left")
            i1 = jnp.searchsorted(nbr_pos, cand_pos + hi_off, side="left")
            cnt = jnp.minimum(i1 - i0, k).astype(jnp.int32)
            start = i0 if take == "first" else i1 - cnt
            ranks = jnp.arange(k, dtype=jnp.int32)
            idx = start[:, None].astype(jnp.int32) + ranks[None, :]
            valid = ranks[None, :] < cnt[:, None]
            sel_parts.append(jnp.where(valid, idx, 0))
            val_parts.append(valid)
        sel = jnp.concatenate(sel_parts, axis=1)  # (B, 20)
        val = jnp.concatenate(val_parts, axis=1)
        order = jnp.argsort(~val, axis=1, stable=True)
        sel = jnp.take_along_axis(sel, order, axis=1)
        val = jnp.take_along_axis(val, order, axis=1)
        n = val.sum(axis=1).astype(jnp.int32)
        ranks = jnp.arange(sel.shape[1], dtype=jnp.int32)
        if side == "left":
            cols = CENTER - n[:, None] + ranks[None, :]
        else:
            cols = jnp.broadcast_to(CENTER + 1 + ranks[None, :], sel.shape)
        uni = nbr_union[jnp.clip(sel, 0, max(M - 1, 0))].astype(jnp.int32)
        cols_w = jnp.where(val, cols, WIDTH)  # invalid → trash column
        soc = soc.at[jnp.arange(B)[:, None], cols_w].set(
            jnp.where(val, uni, -1))
    soc = soc[:, :WIDTH]
    return soc.at[:, CENTER].set(cand_site.astype(jnp.int32))


def _gather_forward_impl(params, table, site_ref, cand_site, site_of_col,
                         rid, read_mask, norm, haploid):
    """Shared tail of the gather kernels: dense (B, R, 41) code gather
    from the site table + CNN forward. Reads with read_mask=False may
    carry garbage codes — they contribute exactly 0 to the einsum
    (grp is masked), so probabilities are bitwise-identical to the
    dense path."""
    soc = site_of_col.astype(jnp.int32)
    col_valid = soc >= 0
    s_trash = table.shape[0] - 1
    site_sel = jnp.where(col_valid, soc, s_trash)
    codes = table[site_sel[:, None, :], rid[:, :, None]]  # (B, R, 41)
    soc_c = jnp.clip(soc, 0, site_ref.shape[0] - 1)
    col_ref = jnp.where(col_valid, site_ref[soc_c], 4).astype(jnp.int8)
    center_ref = site_ref[jnp.clip(cand_site, 0, site_ref.shape[0] - 1)]
    return _snp_forward_dense(params, codes, read_mask, col_ref, col_valid,
                              center_ref, norm, haploid)


def _gather_from_tables(params, table, rid_table, depth_table, site_ref,
                        nbr_pos, nbr_union, cand_site, cand_pos, norm, R,
                        seq_type, haploid):
    """Candidate-batch forward from the prebuilt chunk state: on-device
    neighbor selection, read-list rows + code gather + CNN."""
    cand_site = cand_site.astype(jnp.int32)
    site_of_col = _device_select_neighbors(cand_site, cand_pos, nbr_pos,
                                           nbr_union, seq_type)
    cs = jnp.clip(cand_site, 0, rid_table.shape[0] - 1)
    rid = rid_table[cs]
    depth = depth_table[cs]
    r = jnp.arange(R, dtype=jnp.int32)
    read_mask = r[None, :] < jnp.minimum(depth, R)[:, None]
    return _gather_forward_impl(params, table, site_ref, cand_site,
                                site_of_col, rid, read_mask, norm, haploid)


@partial(jax.jit, static_argnames=("R", "seq_type", "haploid"))
def _snp_forward_gather(params, table, rid_table, depth_table, site_ref,
                        nbr_pos, nbr_union, cand_site, cand_pos, norm, R,
                        seq_type, haploid=False):
    """Forward one candidate batch against prebuilt chunk tables (split
    path: the build amortizes over a chunk's batches)."""
    return _gather_from_tables(params, table, rid_table, depth_table,
                               site_ref, nbr_pos, nbr_union, cand_site,
                               cand_pos, norm, R, seq_type, haploid)


@partial(jax.jit, static_argnames=("R", "seq_type", "haploid"))
def _snp_forward_deep(params, table, site_ref, nbr_pos, nbr_union,
                      cand_site, cand_pos, deep_rids, n_valid, norm, R,
                      seq_type, haploid=False):
    """Deep (depth > maxcov) candidates: the sampled read set is an
    explicit host-sampled read-id matrix (deterministic position-keyed
    sample)."""
    cand_site = cand_site.astype(jnp.int32)
    site_of_col = _device_select_neighbors(cand_site, cand_pos, nbr_pos,
                                           nbr_union, seq_type)
    r = jnp.arange(R, dtype=jnp.int32)
    read_mask = r[None, :] < n_valid[:, None]
    rid = jnp.clip(deep_rids.astype(jnp.int32), 0, table.shape[1] - 1)
    return _gather_forward_impl(params, table, site_ref, cand_site,
                                site_of_col, rid, read_mask, norm, haploid)


@partial(jax.jit,
         static_argnames=("s_pad", "n_pad", "R", "seq_type", "haploid"))
def _snp_forward_chunk_fused(params, read_lo, read_hi, site_ref,
                             site_major, site_minor, minor_bits,
                             exc_packed,
                             exc_indptr, e_real, hole_site, hole_rid,
                             nbr_pos, nbr_union, cand_site, cand_pos, norm,
                             s_pad, n_pad, R, seq_type="ont", haploid=False):
    """Single-launch table reconstruction + neighbor selection + forward
    — the flagship forward step (used by __graft_entry__/bench;
    production splits the build out when it amortizes over a chunk's
    batches). Read lists are built only for the batch's candidate rows
    (the split path materializes them for every site instead)."""
    obs_mask, table = _build_obs_tables_impl(
        read_lo, read_hi, site_major, site_minor, minor_bits,
        exc_packed, exc_indptr, e_real,
        hole_site, hole_rid, s_pad, n_pad)
    cand_site = cand_site.astype(jnp.int32)
    site_of_col = _device_select_neighbors(cand_site, cand_pos, nbr_pos,
                                           nbr_union, seq_type)
    rows = obs_mask[jnp.clip(cand_site, 0, s_pad)]
    rid, depth = _rid_matrix(rows, R)
    r = jnp.arange(R, dtype=jnp.int32)
    read_mask = r[None, :] < jnp.minimum(depth, R)[:, None]
    return _gather_forward_impl(params, table, site_ref, cand_site,
                                site_of_col, rid, read_mask, norm, haploid)


def _device_select_neighbors_clamped(cand_site, cand_pos, nbr_pos,
                                     nbr_union, seq_type, lo_c, hi_c):
    """_device_select_neighbors against GROUP-level neighbor arrays,
    with per-candidate window clamps [lo_c, hi_c) restricting selection
    to the candidate's own member scan window. Since the member's
    neighbor list equals nbr_pos[lo_c:hi_c] (verified at assembly), the
    clamped searchsorted indices translate the member kernel's exactly —
    the same physical sites are selected in the same band order."""
    sched = BAND_SCHEDULES[seq_type]
    B = cand_site.shape[0]
    M = nbr_union.shape[0]
    lo_c = lo_c.astype(jnp.int32)
    hi_c = hi_c.astype(jnp.int32)
    soc = jnp.full((B, WIDTH + 1), -1, jnp.int32)
    for side in ("left", "right"):
        sel_parts, val_parts = [], []
        for lo_off, hi_off, k, take in sched[side]:
            i0 = jnp.searchsorted(nbr_pos, cand_pos + lo_off, side="left")
            i1 = jnp.searchsorted(nbr_pos, cand_pos + hi_off, side="left")
            i0 = jnp.clip(i0.astype(jnp.int32), lo_c, hi_c)
            i1 = jnp.clip(i1.astype(jnp.int32), lo_c, hi_c)
            cnt = jnp.minimum(i1 - i0, k).astype(jnp.int32)
            start = i0 if take == "first" else i1 - cnt
            ranks = jnp.arange(k, dtype=jnp.int32)
            idx = start[:, None].astype(jnp.int32) + ranks[None, :]
            valid = ranks[None, :] < cnt[:, None]
            sel_parts.append(jnp.where(valid, idx, 0))
            val_parts.append(valid)
        sel = jnp.concatenate(sel_parts, axis=1)
        val = jnp.concatenate(val_parts, axis=1)
        order = jnp.argsort(~val, axis=1, stable=True)
        sel = jnp.take_along_axis(sel, order, axis=1)
        val = jnp.take_along_axis(val, order, axis=1)
        n = val.sum(axis=1).astype(jnp.int32)
        ranks = jnp.arange(sel.shape[1], dtype=jnp.int32)
        if side == "left":
            cols = CENTER - n[:, None] + ranks[None, :]
        else:
            cols = jnp.broadcast_to(CENTER + 1 + ranks[None, :], sel.shape)
        uni = nbr_union[jnp.clip(sel, 0, max(M - 1, 0))].astype(jnp.int32)
        cols_w = jnp.where(val, cols, WIDTH)
        soc = soc.at[jnp.arange(B)[:, None], cols_w].set(
            jnp.where(val, uni, -1))
    soc = soc[:, :WIDTH]
    return soc.at[:, CENTER].set(cand_site.astype(jnp.int32))


def _lower_bound_rows(keys, lo, hi, q, iters, k_pad):
    """Vectorized lower_bound of q within keys[lo:hi) (CSR row slices).

    lo/hi/q: broadcast-compatible int32 arrays. `iters` must be ≥
    ceil(log2(max row length)) + 1 (callers use n_pad.bit_length();
    rows never exceed the read count). Returns the insertion index."""
    shape = jnp.broadcast_shapes(lo.shape, hi.shape, q.shape)
    lo_b = jnp.broadcast_to(lo, shape).astype(jnp.int32)
    hi_b = jnp.broadcast_to(hi, shape).astype(jnp.int32)
    for _ in range(iters):
        active = lo_b < hi_b
        mid = (lo_b + hi_b) >> 1
        v = keys[jnp.clip(mid, 0, k_pad - 1)].astype(jnp.int32)
        less = v < q
        lo_b = jnp.where(active & less, mid + 1, lo_b)
        hi_b = jnp.where(active & ~less, mid, hi_b)
    return lo_b


def _group_cell_codes(read_lo, read_hi, minor_bits, major_ext, minor_ext,
                      exc_indptr, exc_rid, exc_code, hole_indptr, hole_rid,
                      site_sel, rid, s_pad, iters):
    """Cell codes for (site_sel[b, w], rid[b, r]) straight from the
    interval+exception wire format — no dense site×read table is ever
    materialized (the group-payload design, SnpGroupFeatures docstring):

        covered  = read_lo[q] ≤ s ≤ read_hi[q]  minus the hole CSR
        code     = exception CSR hit ? exc_code
                 : top-2 bitmask bit ? site_minor[s] : site_major[s]
        cell     = covered ? code : 4

    Identical cell values to the per-chunk table build
    (_build_obs_tables_impl) by construction: both decode the same
    encoding. site_sel uses s_pad as the trash row (no read's span
    reaches it; major/minor_ext carry code 4 there)."""
    s_q = site_sel[:, None, :]                            # (B, 1, W)
    q = rid[:, :, None]                                   # (B, R, 1)
    rl = read_lo.astype(jnp.int32)
    rh = read_hi.astype(jnp.int32)
    lo_q = rl[q]
    hi_q = rh[q]
    covered = (lo_q <= s_q) & (s_q <= hi_q)               # (B, R, W)
    s_c = jnp.clip(s_q, 0, s_pad)
    if minor_bits.shape[0]:
        spans = jnp.maximum(rh - rl + 1, 0)
        span_start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(spans)[:-1]])
        T = minor_bits.shape[0] * 8
        bit = jnp.clip(span_start[q] + (s_q - lo_q), 0, T - 1)
        byte = minor_bits[bit >> 3].astype(jnp.int32)
        minor = ((byte >> (bit & 7)) & 1).astype(bool)
        base = jnp.where(minor, minor_ext[s_c], major_ext[s_c])
    else:
        base = major_ext[s_c]
    code = base
    if exc_rid.shape[0]:
        lo = exc_indptr[s_c].astype(jnp.int32)
        hi = exc_indptr[s_c + 1].astype(jnp.int32)
        qb = jnp.broadcast_to(q, covered.shape)
        pos = _lower_bound_rows(exc_rid, lo, hi, qb, iters,
                                exc_rid.shape[0])
        hit = (pos < jnp.broadcast_to(hi, covered.shape)) \
            & (exc_rid[jnp.clip(pos, 0, exc_rid.shape[0] - 1)]
               .astype(jnp.int32) == qb)
        code = jnp.where(hit,
                         exc_code[jnp.clip(pos, 0, exc_code.shape[0] - 1)],
                         base)
    if hole_rid.shape[0]:
        lo = hole_indptr[s_c].astype(jnp.int32)
        hi = hole_indptr[s_c + 1].astype(jnp.int32)
        qb = jnp.broadcast_to(q, covered.shape)
        pos = _lower_bound_rows(hole_rid, lo, hi, qb, iters,
                                hole_rid.shape[0])
        hole = (pos < jnp.broadcast_to(hi, covered.shape)) \
            & (hole_rid[jnp.clip(pos, 0, hole_rid.shape[0] - 1)]
               .astype(jnp.int32) == qb)
        covered = covered & ~hole
    return jnp.where(covered, code, jnp.int8(4)).astype(jnp.int8)


def _group_forward_tail(params, site_ref, cand_site, soc, codes, read_mask,
                        norm, s_pad, haploid):
    col_valid = soc >= 0
    soc_c = jnp.clip(soc, 0, s_pad - 1)
    col_ref = jnp.where(col_valid, site_ref[soc_c], 4).astype(jnp.int8)
    center_ref = site_ref[jnp.clip(cand_site, 0, s_pad - 1)]
    return _snp_forward_dense(params, codes, read_mask, col_ref, col_valid,
                              center_ref, norm, haploid)


def _group_body(params, read_lo, read_hi, site_ref, site_major,
                       site_minor, minor_bits, exc_indptr, exc_rid,
                       exc_code, hole_indptr, hole_rid, nbr_pos, nbr_union,
                       cand_site, cand_pos, norm, nbr_lo, nbr_hi,
                       s_pad, n_pad, R, seq_type="ont", haploid=False):
    """Candidate-batch forward against a GROUP payload: clamped neighbor
    selection, interval-derived covering-read lists, table-free cell
    codes, CNN. The (bs, R) batch shapes equal the per-chunk kernels'
    for the same member, so probabilities are bitwise-identical
    (tests/test_snp_group.py::TestGroupPayload)."""
    iters = int(n_pad).bit_length()
    cand_site = cand_site.astype(jnp.int32)
    soc = _device_select_neighbors_clamped(
        cand_site, cand_pos, nbr_pos, nbr_union, seq_type, nbr_lo, nbr_hi)
    rl = read_lo.astype(jnp.int32)
    rh = read_hi.astype(jnp.int32)
    s_c = jnp.clip(cand_site, 0, s_pad)
    iv = (rl[None, :] <= s_c[:, None]) & (s_c[:, None] <= rh[None, :])
    if hole_rid.shape[0]:
        qn = jnp.broadcast_to(jnp.arange(n_pad, dtype=jnp.int32)[None, :],
                              iv.shape)
        lo = hole_indptr[s_c][:, None].astype(jnp.int32)
        hi = hole_indptr[s_c + 1][:, None].astype(jnp.int32)
        pos = _lower_bound_rows(hole_rid, lo, hi, qn, iters,
                                hole_rid.shape[0])
        hole = (pos < jnp.broadcast_to(hi, iv.shape)) \
            & (hole_rid[jnp.clip(pos, 0, hole_rid.shape[0] - 1)]
               .astype(jnp.int32) == qn)
        iv = iv & ~hole
    rid, depth = _rid_matrix(iv, R)
    r = jnp.arange(R, dtype=jnp.int32)
    read_mask = r[None, :] < jnp.minimum(depth, R)[:, None]
    site_sel = jnp.where(soc >= 0, soc, s_pad)
    major_ext = jnp.concatenate([site_major, jnp.full((1,), 4, jnp.int8)])
    minor_ext = jnp.concatenate([site_minor, jnp.full((1,), 4, jnp.int8)])
    codes = _group_cell_codes(rl, rh, minor_bits, major_ext, minor_ext,
                              exc_indptr, exc_rid, exc_code,
                              hole_indptr, hole_rid, site_sel, rid,
                              s_pad, iters)
    return _group_forward_tail(params, site_ref, cand_site, soc, codes,
                               read_mask, norm, s_pad, haploid)


def _group_deep_body(params, read_lo, read_hi, site_ref, site_major,
                            site_minor, minor_bits, exc_indptr, exc_rid,
                            exc_code, hole_indptr, hole_rid, nbr_pos,
                            nbr_union, cand_site, cand_pos, deep_rids,
                            n_valid, norm, nbr_lo, nbr_hi,
                            s_pad, n_pad, R, seq_type="ont", haploid=False):
    """Deep (depth > maxcov) candidates against a GROUP payload: the
    host-sampled GROUP read ids are explicit (same position-keyed sample
    as every other path)."""
    iters = int(n_pad).bit_length()
    cand_site = cand_site.astype(jnp.int32)
    soc = _device_select_neighbors_clamped(
        cand_site, cand_pos, nbr_pos, nbr_union, seq_type, nbr_lo, nbr_hi)
    rl = read_lo.astype(jnp.int32)
    rh = read_hi.astype(jnp.int32)
    rid = jnp.clip(deep_rids.astype(jnp.int32), 0, n_pad - 1)
    r = jnp.arange(R, dtype=jnp.int32)
    read_mask = r[None, :] < n_valid[:, None]
    site_sel = jnp.where(soc >= 0, soc, s_pad)
    major_ext = jnp.concatenate([site_major, jnp.full((1,), 4, jnp.int8)])
    minor_ext = jnp.concatenate([site_minor, jnp.full((1,), 4, jnp.int8)])
    codes = _group_cell_codes(rl, rh, minor_bits, major_ext, minor_ext,
                              exc_indptr, exc_rid, exc_code,
                              hole_indptr, hole_rid, site_sel, rid,
                              s_pad, iters)
    return _group_forward_tail(params, site_ref, cand_site, soc, codes,
                               read_mask, norm, s_pad, haploid)


@partial(jax.jit,
         static_argnames=("s_pad", "n_pad", "R", "seq_type", "haploid"))
def _snp_forward_group(params, read_lo, read_hi, site_ref, site_major,
                       site_minor, minor_bits, exc_indptr, exc_rid,
                       exc_code, hole_indptr, hole_rid, nbr_pos, nbr_union,
                       cand_site, cand_pos, norm, nbr_lo, nbr_hi,
                       s_pad, n_pad, R, seq_type="ont", haploid=False):
    """Unpacked-argument group kernel (fallback for payloads whose
    site/read indices exceed uint16; also the test/bench entry)."""
    return _group_body(params, read_lo, read_hi, site_ref, site_major,
                       site_minor, minor_bits, exc_indptr, exc_rid,
                       exc_code, hole_indptr, hole_rid, nbr_pos, nbr_union,
                       cand_site, cand_pos, norm, nbr_lo, nbr_hi,
                       s_pad, n_pad, R, seq_type, haploid)


@partial(jax.jit,
         static_argnames=("s_pad", "n_pad", "R", "seq_type", "haploid"))
def _snp_forward_group_deep(params, read_lo, read_hi, site_ref, site_major,
                            site_minor, minor_bits, exc_indptr, exc_rid,
                            exc_code, hole_indptr, hole_rid, nbr_pos,
                            nbr_union, cand_site, cand_pos, deep_rids,
                            n_valid, norm, nbr_lo, nbr_hi,
                            s_pad, n_pad, R, seq_type="ont", haploid=False):
    return _group_deep_body(params, read_lo, read_hi, site_ref, site_major,
                            site_minor, minor_bits, exc_indptr, exc_rid,
                            exc_code, hole_indptr, hole_rid, nbr_pos,
                            nbr_union, cand_site, cand_pos, deep_rids,
                            n_valid, norm, nbr_lo, nbr_hi,
                            s_pad, n_pad, R, seq_type, haploid)


# ---------------------------------------------------------------------------
# Packed group payload: the 13 payload arrays consolidate into THREE
# wire buffers (uint8 / uint16 / int32), because each array in a
# device_put pays its own dispatch overhead on the tunnel (~0.13 ms ×
# 13 arrays ≈ the payload's entire transfer time). The jitted kernel
# slices the logical arrays back out at static offsets — zero extra
# wire, zero host work. Only used when site AND read indices fit uint16
# (s_pad+1 < 2^16, n_pad < 2^16 — every typical group); the unpacked
# kernels remain for the rest.
# ---------------------------------------------------------------------------

def _group_layout(s_pad, n_pad, e_pad, h_pad, t_pad, m_pad):
    """(b8 segment lengths, b16 segment lengths, b32 segment lengths) —
    fixed order; all static given the padded dims."""
    b8 = (s_pad, s_pad, s_pad, e_pad, t_pad)  # ref|major|minor|exc_code|bits
    b16 = (n_pad, n_pad, e_pad, h_pad, m_pad)  # rlo|rhi|exc_rid|hole|nbru
    ei = s_pad + 2 if e_pad else 1
    hi = s_pad + 2 if h_pad else 1
    b32 = (m_pad, ei, hi)  # nbr_pos|exc_indptr|hole_indptr
    return b8, b16, b32


def _pack_group_payload(read_lo, read_hi, site_ref, site_major, site_minor,
                        minor_bits, exc_indptr, exc_rid, exc_code,
                        hole_indptr, hole_rid, nbr_pos, nbr_union):
    """Host-side packing into (b8 uint8, b16 uint16, b32 int32)."""
    b8 = np.concatenate([
        site_ref.view(np.uint8), site_major.view(np.uint8),
        site_minor.view(np.uint8), exc_code.view(np.uint8), minor_bits])
    b16 = np.concatenate([read_lo, read_hi, exc_rid, hole_rid, nbr_union])
    b32 = np.concatenate([nbr_pos, exc_indptr, hole_indptr])
    return b8, b16, b32


def _unpack_group_payload(b8, b16, b32, s_pad, n_pad, e_pad, h_pad, t_pad,
                          m_pad):
    """In-jit unpacking (static slices; dtypes value-preserving: site/
    code values are 0-4, index values < 2^16)."""
    l8, l16, l32 = _group_layout(s_pad, n_pad, e_pad, h_pad, t_pad, m_pad)

    def seg(buf, lens, i):
        off = sum(lens[:i])
        return jax.lax.slice_in_dim(buf, off, off + lens[i])

    site_ref = seg(b8, l8, 0).astype(jnp.int8)
    site_major = seg(b8, l8, 1).astype(jnp.int8)
    site_minor = seg(b8, l8, 2).astype(jnp.int8)
    exc_code = seg(b8, l8, 3).astype(jnp.int8)
    minor_bits = seg(b8, l8, 4)
    read_lo = seg(b16, l16, 0)
    read_hi = seg(b16, l16, 1)
    exc_rid = seg(b16, l16, 2)
    hole_rid = seg(b16, l16, 3)
    nbr_union = seg(b16, l16, 4)
    nbr_pos = seg(b32, l32, 0)
    exc_indptr = seg(b32, l32, 1)
    hole_indptr = seg(b32, l32, 2)
    return (read_lo, read_hi, site_ref, site_major, site_minor, minor_bits,
            exc_indptr, exc_rid, exc_code, hole_indptr, hole_rid, nbr_pos,
            nbr_union)


@partial(jax.jit,
         static_argnames=("s_pad", "n_pad", "e_pad", "h_pad", "t_pad",
                          "m_pad", "R", "seq_type", "haploid"))
def _snp_forward_group_packed(params, b8, b16, b32, cand_site, cand_pos,
                              norm, nbr_lo, nbr_hi, s_pad, n_pad, e_pad,
                              h_pad, t_pad, m_pad, R, seq_type="ont",
                              haploid=False):
    payload = _unpack_group_payload(b8, b16, b32, s_pad, n_pad, e_pad,
                                    h_pad, t_pad, m_pad)
    return _group_body(params, *payload, cand_site, cand_pos, norm,
                       nbr_lo, nbr_hi, s_pad, n_pad, R, seq_type, haploid)


@partial(jax.jit,
         static_argnames=("s_pad", "n_pad", "e_pad", "h_pad", "t_pad",
                          "m_pad", "R", "seq_type", "haploid"))
def _snp_forward_group_deep_packed(params, b8, b16, b32, cand_site,
                                   cand_pos, deep_rids, n_valid, norm,
                                   nbr_lo, nbr_hi, s_pad, n_pad, e_pad,
                                   h_pad, t_pad, m_pad, R, seq_type="ont",
                                   haploid=False):
    payload = _unpack_group_payload(b8, b16, b32, s_pad, n_pad, e_pad,
                                    h_pad, t_pad, m_pad)
    return _group_deep_body(params, *payload, cand_site, cand_pos,
                            deep_rids, n_valid, norm, nbr_lo, nbr_hi,
                            s_pad, n_pad, R, seq_type, haploid)


@partial(jax.jit,
         static_argnames=("s_pad", "n_pad", "e_pad", "h_pad", "t_pad",
                          "m_pad", "R", "seq_type", "haploid"))
def _snp_forward_group_scan(params, b8, b16, b32, cand_site, cand_pos,
                            norm, nbr_lo, nbr_hi, s_pad, n_pad, e_pad,
                            h_pad, t_pad, m_pad, R, seq_type="ont",
                            haploid=False):
    """ALL of a cohort's candidate batches in ONE launch: lax.scan over
    the stacked (k, bs, ...) batch axis, body = the per-batch group
    kernel with the SAME (bs, R) shapes. Each tunnel launch costs
    ~0.5 ms of fixed latency regardless of size, so k batches as one
    scan cost ~1 launch instead of k. Bitwise-identical to k separate
    launches (the scan body compiles the same per-batch program;
    pinned by tests/test_snp_group_payload.py::test_scan_identity)."""
    payload = _unpack_group_payload(b8, b16, b32, s_pad, n_pad, e_pad,
                                    h_pad, t_pad, m_pad)

    def body(carry, xs):
        cs, cp, nm, lo, hi = xs
        out = _group_body(params, *payload, cs, cp, nm, lo, hi,
                          s_pad, n_pad, R, seq_type, haploid)
        return carry, out

    _, outs = jax.lax.scan(body, 0,
                           (cand_site, cand_pos, norm, nbr_lo, nbr_hi))
    return outs  # (k, bs, 4)


@dataclass
class SnpCallerState:
    params: dict
    train_coverage: float
    hap_params: dict
    hap_train_coverage: float = HAPLOID_TRAIN_COVERAGE
    # multi-chip serving mesh (all-dp): batches split over 'dp', params
    # replicated — the in-run analog of the reference's worker fan-out
    # (snpCaller.py:213-245). None on single-device.
    mesh: object = None

    @classmethod
    def create(cls, snp_model_name, mesh="auto"):
        from .runtime.sharding import inference_mesh, replicated

        params, cov = load_model("snp", snp_model_name)
        hap_params, _ = load_model("snp", "haploid")
        if mesh == "auto":
            mesh = inference_mesh()
        if mesh is not None:
            rep = replicated(mesh)
            params = jax.device_put(params, rep)
            hap_params = jax.device_put(hap_params, rep)
        return cls(params=params, train_coverage=cov, hap_params=hap_params,
                   mesh=mesh)


_RECORDED_SHAPES = set()


# bump when kernel signatures change shape semantics (stale entries
# would full-compile instead of cache-hitting during preload)
_SHAPE_MEMORY_VERSION = 4  # v4: top-2 + span-bitmask coding


def _shape_memory_path():
    import os

    from .runtime.cache import jax_cache_dir

    return os.path.join(jax_cache_dir(), "snp_shape_memory.json")


def _record_shape(sig):
    """Remember a realized dedup-kernel signature (per machine) so the
    next run can warm its cached executable during feature generation.
    Best-effort; bounded to the 16 most recent distinct signatures.
    Only recorded when a persistent compilation cache is configured
    (otherwise there is nothing to preload, and CPU test runs would
    pollute the machine-level file)."""
    import json
    import os

    try:
        if jax.config.jax_compilation_cache_dir is None:
            return
    except Exception:
        return
    path = _shape_memory_path()
    try:
        entries = []
        if os.path.exists(path):
            with open(path) as fh:
                entries = json.load(fh)
        sig = dict(sig, v=_SHAPE_MEMORY_VERSION, jax=jax.__version__)
        entries = [e for e in entries if e != sig]
        entries.append(sig)
        entries = entries[-16:]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp.%d" % os.getpid()
        with open(tmp, "w") as fh:
            json.dump(entries, fh)
        os.replace(tmp, path)
    except Exception:
        pass


class _PreloadThread:
    """Background warm thread with a cooperative stop: a short run must
    not block at join() behind the remaining warm list."""

    def __init__(self, target):
        import threading

        self.stop = threading.Event()
        self._t = threading.Thread(target=target, args=(self.stop,),
                                   daemon=True)
        self._t.start()

    def join(self):
        self.stop.set()  # skip any entries not yet started
        self._t.join()


def preload_remembered_shapes(state: SnpCallerState, cfg):
    """Warm the dedup kernels for this machine's remembered shape
    signatures on a background thread (loads from the persistent
    compilation cache — measured ~2 s per executable — concurrently
    with host feature generation). Also seeds the compile-aware bucket
    registries so real chunks snap to the warmed shapes. Returns a
    handle with .join() (called before call_snps returns) or None.

    Guards: entries are filtered to this run's batch size, seq type,
    ploidy and the recording jax version (stale entries would FULL-
    compile, not cache-hit); the warm loop stops early if an entry
    takes compile-scale time (>10 s — the cache must have rotated) so
    it can never spend minutes compiling concurrently with the main
    thread's own remote compiles."""
    import json
    import time

    try:
        if jax.config.jax_compilation_cache_dir is None:
            return None  # no persistent cache → this would full-compile
        with open(_shape_memory_path()) as fh:
            entries = json.load(fh)
    except Exception:
        return None
    bs_run = dp_scale_safe(cfg, state)
    want_haploid = bool(getattr(cfg, "haploid_genome", False)
                        or getattr(cfg, "haploid_X", False))
    entries = [
        e for e in entries
        if e.get("v") == _SHAPE_MEMORY_VERSION
        and e.get("jax") == jax.__version__
        and e.get("bs") == bs_run
        and e.get("seq_type") == cfg.sequencing
        and (not e.get("haploid") or want_haploid)
    ]
    if not entries:
        return None
    for e in entries:  # seed bucket reuse toward remembered shapes
        try:
            _bucket_ev.used.add(int(e["e_pad"]))
            _bucket_sites.used.add(int(e["s_pad"]))
            _bucket_reads.used.add(int(e["n_pad"]))
            _bucket_nbr.used.add(int(e["m_pad"]))
        except Exception:
            pass

    # warm with the PRODUCTION shardings: on a multi-device mesh the
    # executable is keyed on the input shardings, so unsharded warm args
    # would load/compile a variant production never runs
    from .runtime.sharding import replicated, shard_batch

    mesh = state.mesh
    put_rep = (lambda a: jax.device_put(a, replicated(mesh)))         if mesh is not None else jax.device_put

    def _warm_group(e):
        """Warm one group-payload kernel signature (kind == 'group')."""
        i32 = np.int32
        s_pad, n_pad = e["s_pad"], e["n_pad"]
        e_pad = int(e["e_pad"])
        h_pad = int(e.get("h_pad", 0))
        t_pad = int(e.get("t_pad", 0))
        m_pad = e["m_pad"]
        packed = bool(e.get("packed"))
        sdt = np.uint16 if packed else i32
        rdt = np.uint16 if packed else i32
        arrays = (
            np.ones(n_pad, sdt), np.zeros(n_pad, sdt),
            np.full(s_pad, 4, np.int8), np.full(s_pad, 4, np.int8),
            np.full(s_pad, 4, np.int8),
            np.zeros(t_pad, np.uint8),
            np.zeros(s_pad + 2 if e_pad else 1, i32),
            np.zeros(e_pad, rdt),
            np.full(e_pad, 4, np.int8),
            np.zeros(s_pad + 2 if h_pad else 1, i32),
            np.zeros(h_pad, rdt),
            np.full(m_pad, np.int32(1 << 30), i32),
            np.zeros(m_pad, sdt))
        (read_lo, read_hi, site_ref, site_major, site_minor, minor_bits,
         exc_indptr, exc_rid, exc_code, hole_indptr, hole_rid,
         nbr_pos, nbr_union) = arrays
        if packed:
            payload = put_rep(_pack_group_payload(
                read_lo, read_hi, site_ref, site_major, site_minor,
                minor_bits, exc_indptr, exc_rid, exc_code, hole_indptr,
                hole_rid, nbr_pos, nbr_union))
        else:
            payload = put_rep(arrays)
        bs = e["bs"]
        params = state.hap_params if e["haploid"] else state.params
        base = (np.zeros(bs, i32), np.full(bs, -(1 << 30), i32))
        tail = (np.ones(bs, np.float32), np.zeros(bs, i32),
                np.zeros(bs, i32))
        dims = dict(s_pad=s_pad, n_pad=n_pad, R=e["R"],
                    seq_type=e["seq_type"], haploid=e["haploid"])
        if packed:
            dims.update(e_pad=e_pad, h_pad=h_pad, t_pad=t_pad,
                        m_pad=m_pad)
        if e.get("deep"):
            args = shard_batch(
                base + (np.zeros((bs, e["R"]), i32), np.zeros(bs, i32))
                + tail, mesh)
            fn = _snp_forward_group_deep_packed if packed \
                else _snp_forward_group_deep
        elif packed:
            k = int(e.get("k", 1)) or 1
            args = shard_batch(
                tuple(np.broadcast_to(a, (k,) + a.shape).copy()
                      for a in base + tail), mesh)
            fn = _snp_forward_group_scan
        else:
            args = shard_batch(base + tail, mesh)
            fn = _snp_forward_group
        out = fn(params, *payload, *args, **dims)
        jax.block_until_ready(out)

    def _warm(stop):
        for e in entries:
            if stop.is_set():
                return
            t0 = time.monotonic()
            try:
                if e.get("kind") == "group":
                    _warm_group(e)
                    if time.monotonic() - t0 > 10.0:
                        return  # compile-scale: cache rotated
                    continue
                sdt = np.uint16 if e["s_pad"] + 1 < (1 << 16) \
                    else np.int32
                rdt = np.uint16 if e["n_pad"] < (1 << 16) else np.int32
                edt = np.uint16 if e["e_pad"] < (1 << 16) else np.int32
                exc = put_rep(np.zeros(
                    e["e_pad"], np.uint16 if e["ev16"] else np.uint32))
                exc_indptr = put_rep(np.zeros(e["s_pad"] + 1, edt))
                site_ref = put_rep(np.full(e["s_pad"], 4, np.int8))
                site_major = put_rep(np.full(e["s_pad"], 4, np.int8))
                site_minor = put_rep(np.full(e["s_pad"], 4, np.int8))
                minor_bits = put_rep(np.zeros(int(e.get("t_pad", 0)),
                                              np.uint8))
                read_lo = put_rep(np.ones(e["n_pad"], sdt))
                read_hi = put_rep(np.zeros(e["n_pad"], sdt))
                h_pad = int(e.get("h_pad", 0))
                hole_site = put_rep(np.full(h_pad, e["s_pad"], sdt))
                hole_rid = put_rep(np.zeros(h_pad, rdt))
                nbr_pos = put_rep(np.full(e["m_pad"], np.int32(1 << 30),
                                          np.int32))
                nbr_union = put_rep(np.zeros(e["m_pad"], sdt))
                e_real = put_rep(np.int32(0))
                bs = e["bs"]
                batch = shard_batch(
                    (np.zeros(bs, sdt),
                     np.full(bs, -(1 << 30), np.int32),
                     np.ones(bs, np.float32)), mesh)
                params = state.hap_params if e["haploid"] else state.params
                out = _snp_forward_chunk_fused(
                    params, read_lo, read_hi, site_ref, site_major,
                    site_minor, minor_bits, exc,
                    exc_indptr, e_real, hole_site, hole_rid, nbr_pos,
                    nbr_union, *batch,
                    s_pad=e["s_pad"], n_pad=e["n_pad"], R=e["R"],
                    seq_type=e["seq_type"], haploid=e["haploid"])
                jax.block_until_ready(out)
            except Exception:
                return  # best-effort
            if time.monotonic() - t0 > 10.0:
                return  # compile-scale, not a cache hit: cache rotated

    return _PreloadThread(_warm)


def dp_scale_safe(cfg, state):
    from .runtime.sharding import dp_scale

    return dp_scale(cfg.batch_size, state.mesh)


def prewarm_snp_model(state: SnpCallerState, cfg, buckets=(64, 96, 128, 160),
                      diploid=True, haploid=False):
    """Kick off jit compilation of the inference shapes in a background
    thread so (remote) compilation overlaps host feature generation —
    without a persistent cache each run pays ~30-60s per shape otherwise."""
    import threading

    def _warm():
        try:
            for R in buckets:
                if R > cfg.maxcov:
                    continue
                packed = np.zeros((cfg.batch_size, R, (WIDTH + 1) // 2),
                                  np.uint8)
                mask = np.zeros((cfg.batch_size, R), bool)
                cr = np.zeros((cfg.batch_size, WIDTH), np.int8)
                cv = np.zeros((cfg.batch_size, WIDTH), bool)
                ctr = np.zeros(cfg.batch_size, np.int8)
                nrm = np.ones(cfg.batch_size, np.float32)
                if diploid:
                    _snp_forward_packed(state.params, packed, mask, cr, cv,
                                        ctr, nrm)
                if haploid:
                    _snp_forward_packed(state.hap_params, packed, mask, cr,
                                        cv, ctr, nrm, haploid=True)
        except Exception:
            pass  # prewarm is best-effort

    t = threading.Thread(target=_warm, daemon=True)
    t.start()
    return t


def infer_snp_batch(state: SnpCallerState, batch: SnpBatch, cfg, ploidy):
    """Run the model over one chunk's candidates in padded device batches."""
    B = len(batch)
    train_cov = state.train_coverage if ploidy == "diploid" else state.hap_train_coverage
    if cfg.disable_coverage_normalization:
        norm = train_cov / np.maximum(batch.dp.astype(np.float32), 1e-6)
    else:
        cov = batch.coverage
        norm = np.full(B, train_cov / cov if cov > 0 else 1.0, np.float32)

    from .runtime.sharding import dp_scale, shard_batch

    bs = dp_scale(cfg.batch_size, state.mesh)
    params = state.params if ploidy == "diploid" else state.hap_params
    # depth-bucket the read axis: transfers scale with actual coverage,
    # not maxcov, while keeping jit recompiles bounded (≤ #buckets)
    max_depth = int(batch.sampled_depth.max()) if B else 1
    R_b = batch.codes.shape[1]
    for b in _R_BUCKETS:
        if b >= max_depth and b <= batch.codes.shape[1]:
            R_b = b
            break
    codes = batch.codes[:, :R_b]
    read_mask = batch.read_mask[:, :R_b]
    packed = pack_codes(codes)
    out = np.zeros((B, 4), np.float32)
    for lo in range(0, B, bs):
        hi = min(lo + bs, B)
        pad = bs - (hi - lo)
        sl = slice(lo, hi)
        def p(a, fill=0):
            if pad == 0:
                return a[sl]
            padding = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a[sl], padding, constant_values=fill)
        args = shard_batch(
            (p(packed), p(read_mask), p(batch.col_ref, 4),
             p(batch.col_valid), p(batch.center_ref), p(norm, 1.0)),
            state.mesh)
        probs = _snp_forward_packed(
            params, *args, haploid=(ploidy == "haploid"))
        out[sl] = np.asarray(probs)[: hi - lo]
    return out


_R_BUCKETS = (32, 64, 96, 128, 160)

_K_BUCKETS = (1, 2, 3, 4, 6, 8)


def _bucket_k(k):
    """Scan trip-count buckets for the cohort scan launch (a pad batch
    costs one probability-inert body iteration ~0.3 ms; a new trip
    count costs a compile)."""
    for b in _K_BUCKETS:
        if k <= b:
            return b
    return -(-k // 8) * 8


def _pick_r_bucket(max_depth, cap):
    for b in _R_BUCKETS:
        if b >= max_depth and b <= cap:
            return b
    return cap


def infer_snp_chunk(state, feats, cfg, ploidy, async_mode=False):
    """Run the model over one chunk via the deduplicated representation.

    Ships the chunk's interval+exception payload once, reconstructs the
    site×read tables on-device, then streams candidate batches as
    (cand_site, cand_pos, norm) index vectors only. Deep (depth >
    maxcov) candidates go through the explicit-rid kernel with their
    host-sampled read sets.

    async_mode=True returns a zero-arg FINISHER instead of the array:
    all launches are dispatched (async) but no device→host sync happens
    until the finisher runs. The caller pipelines chunk i's compute +
    d2h behind chunk i+1's feature wait — without this, every chunk
    pays a full synchronous tunnel round trip (launch latency dominated
    the 50 Mb SNP stage under mediocre tunnel weather).
    """
    from .runtime.sharding import dp_scale, replicated, shard_batch

    B = len(feats)
    train_cov = state.train_coverage if ploidy == "diploid" \
        else state.hap_train_coverage
    haploid = ploidy == "haploid"
    params = state.params if ploidy == "diploid" else state.hap_params
    if cfg.disable_coverage_normalization:
        norm = train_cov / np.maximum(feats.dp.astype(np.float32), 1e-6)
    else:
        cov = feats.coverage
        norm = np.full(B, train_cov / cov if cov > 0 else 1.0, np.float32)

    # pad + ship the chunk payload once (power-of-two buckets bound
    # recompiles; pad exceptions route to the table's trash row, pad
    # reads carry an empty observed span)
    E = len(feats.exc_packed)
    S = len(feats.exc_indptr) - 1
    e_pad = _bucket_ev(E)
    s_pad = _bucket_sites(S)
    n_pad = _bucket_reads(feats.n_reads)
    if (s_pad + 1) * n_pad > (1 << 29):
        # bucket REUSE must not blow the table allocation past ~512 MB:
        # drop to exact power-of-two pads (each within 2x of the raw
        # dims, whose product the builder capped at 2^27)
        s_pad = _pow2_pad(max(S, 1), 256)
        n_pad = _pow2_pad(max(feats.n_reads, 1), 256)
    # index dtypes: site/read indices ship as uint16 whenever the
    # padded dims fit — these arrays are pure wire (VERDICT r3 item 4);
    # the kernels cast to int32 on-device
    sdt = np.uint16 if s_pad + 1 < (1 << 16) else np.int32
    rdt = np.uint16 if n_pad < (1 << 16) else np.int32
    edt = np.uint16 if e_pad < (1 << 16) else np.int32
    exc_packed = np.full(e_pad, 4, feats.exc_packed.dtype)
    exc_packed[:E] = feats.exc_packed
    exc_indptr = np.full(s_pad + 1, E, edt)
    exc_indptr[:S + 1] = feats.exc_indptr.astype(edt)
    site_ref = np.full(s_pad, 4, np.int8)
    site_ref[:S] = feats.site_ref
    site_major = np.full(s_pad, 4, np.int8)
    site_major[:S] = feats.site_major
    site_minor = np.full(s_pad, 4, np.int8)
    site_minor[:S] = feats.site_minor
    T = len(feats.minor_bits)
    t_pad = 0 if T == 0 else _bucket_bits(T)
    minor_bits = np.zeros(t_pad, np.uint8)
    minor_bits[:T] = feats.minor_bits
    read_lo = np.ones(n_pad, sdt)  # pad reads: empty span
    read_hi = np.zeros(n_pad, sdt)
    read_lo[:feats.n_reads] = feats.read_lo.astype(sdt)
    read_hi[:feats.n_reads] = feats.read_hi.astype(sdt)
    H = len(feats.hole_site)
    h_pad = 0 if H == 0 else _pow2_pad(H, 16)
    hole_site = np.full(h_pad, s_pad, sdt)  # pad holes: trash row
    hole_rid = np.zeros(h_pad, rdt)
    hole_site[:H] = feats.hole_site.astype(sdt)
    hole_rid[:H] = feats.hole_rid.astype(rdt)
    # neighbor-site arrays for on-device selection; position pads sit far
    # outside every band so they can never be selected
    M = len(feats.nbr_pos)
    m_pad = _bucket_nbr(M)
    nbr_pos = np.full(m_pad, np.int32(1 << 30), np.int32)
    nbr_pos[:M] = feats.nbr_pos
    nbr_union = np.zeros(m_pad, sdt)
    nbr_union[:M] = feats.nbr_union.astype(sdt)
    mesh = state.mesh
    put = (lambda a: jax.device_put(a, replicated(mesh))) if mesh is not None \
        else jax.device_put
    # ship the whole chunk payload in ONE device_put (a put per array
    # costs a dispatch round trip each on the tunnel)
    (exc_packed_d, exc_indptr_d, site_ref_d, site_major_d,
     site_minor_d, minor_bits_d, read_lo_d,
     read_hi_d, hole_site_d, hole_rid_d, nbr_pos_d, nbr_union_d,
     e_real) = put(
        (exc_packed, exc_indptr, site_ref, site_major, site_minor,
         minor_bits, read_lo, read_hi,
         hole_site, hole_rid, nbr_pos, nbr_union, np.int32(E)))
    # the split build+gather pair only pays off when deep candidates
    # need the explicit-rid kernel or when the per-batch table rebuild
    # would be expensive (the fused kernel rebuilds the tables every
    # batch — trivial for typical ≤8 MB tables, not for the ≥64 MB
    # tail); bitwise-identical output either way (tests/test_snp_dedup.py)
    use_fused = len(feats.deep_idx) == 0 \
        and (s_pad + 1) * n_pad <= (1 << 26)

    out = np.zeros((B, 4), np.float32)
    parts = []  # (sel, device_probs, n) — converted by the finisher
    deep_mask = np.zeros(B, bool)
    deep_mask[feats.deep_idx] = True
    normal_idx = np.flatnonzero(~deep_mask)

    def padded(a, sel, pad, fill):
        if pad == 0:
            return a[sel]
        padding = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a[sel], padding, constant_values=fill)

    # read-axis bucket: max over ALL candidates (deep ones sample to
    # maxcov), exactly as the dense path chooses it — the reduction tree
    # width must match for bitwise-identical probabilities
    R_b = _pick_r_bucket(int(feats.sampled_depth.max()) if B else 1,
                         feats.maxcov)
    table = rid_table = depth_table = None
    if not use_fused:
        table, rid_table, depth_table = _build_chunk_state(
            read_lo_d, read_hi_d, site_major_d, site_minor_d,
            minor_bits_d, exc_packed_d,
            exc_indptr_d, e_real, hole_site_d, hole_rid_d, s_pad=s_pad,
            n_pad=n_pad, R=int(R_b))
    if len(normal_idx):
        bs = dp_scale(cfg.batch_size, mesh)
        if use_fused:
            sig = {"e_pad": e_pad, "s_pad": s_pad, "n_pad": n_pad,
                   "m_pad": m_pad, "h_pad": h_pad, "t_pad": t_pad,
                   "R": int(R_b), "bs": int(bs),
                   "seq_type": feats.seq_type, "haploid": bool(haploid),
                   "ev16": feats.exc_packed.dtype == np.uint16}
            key = tuple(sorted(sig.items()))
            if key not in _RECORDED_SHAPES:
                _RECORDED_SHAPES.add(key)
                _record_shape(sig)
        for lo in range(0, len(normal_idx), bs):
            from .runtime.watchdog import beat

            # liveness beat per device batch: a hung dispatch/compile
            # stops the beats (stall detected), while a SLOW-but-
            # progressing compile sequence keeps them coming (no false
            # kill on cold runs)
            beat()
            sel = normal_idx[lo:lo + bs]
            pad = bs - len(sel)
            args = shard_batch(
                (padded(feats.cand_site.astype(sdt), sel, pad, 0),
                 padded(feats.cand_pos32, sel, pad, -(1 << 30)),
                 padded(norm, sel, pad, 1.0)), mesh)
            if use_fused:
                probs = _snp_forward_chunk_fused(
                    params, read_lo_d, read_hi_d, site_ref_d,
                    site_major_d, site_minor_d, minor_bits_d,
                    exc_packed_d, exc_indptr_d, e_real,
                    hole_site_d, hole_rid_d, nbr_pos_d, nbr_union_d,
                    *args,
                    s_pad=s_pad, n_pad=n_pad, R=R_b,
                    seq_type=feats.seq_type, haploid=haploid)
            else:
                probs = _snp_forward_gather(
                    params, table, rid_table, depth_table, site_ref_d,
                    nbr_pos_d, nbr_union_d, *args,
                    R=R_b, seq_type=feats.seq_type, haploid=haploid)
            parts.append((sel, probs, len(sel)))

    if len(feats.deep_idx):
        # same padded batch size AND read-axis bucket as the normal/
        # dense paths: the XLA program's reduction/fusion layout depends
        # on both shapes, and bitwise-identical probabilities require
        # matching them (tests/test_downsampling.py pins this)
        Bd = len(feats.deep_idx)
        bs = dp_scale(cfg.batch_size, mesh)
        n_valid_all = np.full(Bd, feats.maxcov, np.int32)
        rids_all = feats.deep_rids
        if R_b > rids_all.shape[1]:
            rids_all = np.pad(rids_all,
                              [(0, 0), (0, R_b - rids_all.shape[1])])
        for lo in range(0, Bd, bs):
            from .runtime.watchdog import beat

            beat()
            dsel = np.arange(lo, min(lo + bs, Bd))
            sel = feats.deep_idx[dsel]
            pad = bs - len(dsel)
            args = shard_batch(
                (padded(feats.cand_site.astype(sdt), sel, pad, 0),
                 padded(feats.cand_pos32, sel, pad, -(1 << 30)),
                 padded(rids_all.astype(rdt), dsel, pad, 0),
                 padded(n_valid_all, dsel, pad, 0),
                 padded(norm, sel, pad, 1.0)), mesh)
            probs = _snp_forward_deep(
                params, table, site_ref_d,
                nbr_pos_d, nbr_union_d, *args,
                R=R_b, seq_type=feats.seq_type, haploid=haploid)
            parts.append((sel, probs, len(dsel)))

    def finish():
        for sel_, probs_, n_ in parts:
            out[sel_] = np.asarray(probs_)[:n_]
        return out

    return finish if async_mode else finish()


def infer_snp_group(state, gf, cfg, async_mode=False):
    """Run the model over a whole decode group from ONE device payload.

    gf: pileup.snp_features.SnpGroupFeatures. Ships the group's
    interval+exception observation payload in a single device_put, then
    streams candidate batches across ALL members — members sharing a
    (ploidy, read-axis-bucket) cohort pack into common bs-sized batches
    (batch membership is probability-neutral: the dedup-vs-dense
    identity suite already pins that batch composition does not change
    row probabilities; shapes are what matter and they are preserved).

    Returns a list of per-member (B, 4) probability arrays aligned with
    gf.members (async_mode=True: a zero-arg finisher returning it)."""
    from .runtime.sharding import dp_scale, replicated, shard_batch

    mesh = state.mesh
    S = len(gf.site_ref)
    N = gf.n_reads
    E = len(gf.exc_rid)
    H = len(gf.hole_rid)
    M = len(gf.nbr_pos)
    T = len(gf.minor_bits)
    s_pad = _bucket_sites(S)
    n_pad = _bucket_reads(max(N, 1))
    e_pad = _bucket_ev(E) if E else 0
    h_pad = _pow2_pad(H, 16) if H else 0
    t_pad = _bucket_bits(T) if T else 0
    m_pad = _bucket_nbr(max(M, 1))
    i32 = np.int32
    # pure-wire index dtypes: site/read indices ship as uint16 whenever
    # the padded dims fit (the kernels cast on-device) — the payload put
    # is a dominant term of the streamed pattern on the tunnel
    sdt = np.uint16 if s_pad + 1 < (1 << 16) else i32
    rdt = np.uint16 if n_pad < (1 << 16) else i32
    read_lo = np.ones(n_pad, sdt)  # pad reads: empty span
    read_hi = np.zeros(n_pad, sdt)
    read_lo[:N] = gf.read_lo.astype(sdt)
    read_hi[:N] = gf.read_hi.astype(sdt)
    site_ref = np.full(s_pad, 4, np.int8)
    site_ref[:S] = gf.site_ref
    site_major = np.full(s_pad, 4, np.int8)
    site_major[:S] = gf.site_major
    site_minor = np.full(s_pad, 4, np.int8)
    site_minor[:S] = gf.site_minor
    minor_bits = np.zeros(t_pad, np.uint8)
    minor_bits[:T] = gf.minor_bits
    # CSR row pointers over s_pad+1 rows (incl. the trash row s_pad,
    # whose slice [E, E) is empty, as are all pad rows ≥ S); an empty
    # CSR collapses to a 1-element placeholder (the kernels static-skip
    # on the rid array's zero length)
    ar = np.arange(s_pad + 2, dtype=i32)
    exc_indptr = np.searchsorted(gf.exc_site, ar).astype(i32) \
        if E else np.zeros(1, i32)
    exc_rid = np.zeros(e_pad, rdt)
    exc_rid[:E] = gf.exc_rid.astype(rdt)
    exc_code = np.full(e_pad, 4, np.int8)
    exc_code[:E] = gf.exc_code
    hole_indptr = np.searchsorted(gf.hole_site, ar).astype(i32) \
        if H else np.zeros(1, i32)
    hole_rid = np.zeros(h_pad, rdt)
    hole_rid[:H] = gf.hole_rid.astype(rdt)
    nbr_pos = np.full(m_pad, np.int32(1 << 30), i32)
    nbr_pos[:M] = gf.nbr_pos
    nbr_union = np.zeros(m_pad, sdt)
    nbr_union[:M] = gf.nbr_union.astype(sdt)
    put = (lambda a: jax.device_put(a, replicated(mesh))) \
        if mesh is not None else jax.device_put
    packed = sdt == np.uint16 and rdt == np.uint16
    if packed:
        # three wire buffers instead of 13 arrays: each array in a
        # device_put pays its own dispatch round trip on the tunnel
        payload = put(_pack_group_payload(
            read_lo, read_hi, site_ref, site_major, site_minor,
            minor_bits, exc_indptr, exc_rid, exc_code, hole_indptr,
            hole_rid, nbr_pos, nbr_union))
    else:
        payload = put(
            (read_lo, read_hi, site_ref, site_major, site_minor,
             minor_bits, exc_indptr, exc_rid, exc_code, hole_indptr,
             hole_rid, nbr_pos, nbr_union))

    bs = dp_scale(cfg.batch_size, mesh)
    n_members = len(gf.members)
    outs = [np.zeros((0, 4), np.float32)] * n_members
    cohorts = {}  # (ploidy, R_b, deep) -> dict of row lists
    for mi, (_oi, sec) in enumerate(gf.members):
        if sec is None or len(sec) == 0:
            continue
        B = len(sec)
        outs[mi] = np.zeros((B, 4), np.float32)
        haploid = sec.ploidy == "haploid"
        train_cov = state.hap_train_coverage if haploid \
            else state.train_coverage
        if cfg.disable_coverage_normalization:
            norm = train_cov / np.maximum(sec.dp.astype(np.float32), 1e-6)
        else:
            cov = sec.coverage
            norm = np.full(B, train_cov / cov if cov > 0 else 1.0,
                           np.float32)
        R_b = _pick_r_bucket(int(sec.sampled_depth.max()), gf.maxcov)
        deep_mask = np.zeros(B, bool)
        deep_mask[sec.deep_idx] = True
        normal_idx = np.flatnonzero(~deep_mask)
        for deep in (False, True):
            rows = sec.deep_idx if deep else normal_idx
            if not len(rows):
                continue
            c = cohorts.setdefault((sec.ploidy, R_b, deep), {
                "cand_site": [], "cand_pos": [], "norm": [],
                "lo": [], "hi": [], "mi": [], "j": [], "rids": [],
            })
            nr = len(rows)
            c["cand_site"].append(sec.cand_site[rows])
            c["cand_pos"].append(sec.cand_pos32[rows])
            c["norm"].append(norm[rows])
            c["lo"].append(np.full(nr, sec.nbr_lo, i32))
            c["hi"].append(np.full(nr, sec.nbr_hi, i32))
            c["mi"].append(np.full(nr, mi, i32))
            c["j"].append(rows)
            if deep:
                rids = sec.deep_rids
                if R_b > rids.shape[1]:
                    rids = np.pad(rids,
                                  [(0, 0), (0, R_b - rids.shape[1])])
                c["rids"].append(rids[:, :R_b])

    parts = []  # (dst_mi, dst_j, device_probs, n)
    for (ploidy, R_b, deep), c in sorted(
            cohorts.items(), key=lambda kv: (kv[0][2], kv[0][0], kv[0][1])):
        haploid = ploidy == "haploid"
        params = state.hap_params if haploid else state.params
        cand_site = np.concatenate(c["cand_site"])
        cand_pos = np.concatenate(c["cand_pos"])
        norm = np.concatenate(c["norm"])
        lo_c = np.concatenate(c["lo"])
        hi_c = np.concatenate(c["hi"])
        dst_mi = np.concatenate(c["mi"])
        dst_j = np.concatenate(c["j"])
        rids = np.concatenate(c["rids"]) if deep else None
        n_rows = len(cand_site)
        sig = {"kind": "group", "s_pad": s_pad, "n_pad": n_pad,
               "e_pad": e_pad, "h_pad": h_pad, "t_pad": t_pad,
               "m_pad": m_pad, "R": int(R_b), "bs": int(bs),
               "seq_type": gf.seq_type, "haploid": bool(haploid),
               "deep": bool(deep), "packed": bool(packed),
               "k": _bucket_k((n_rows + bs - 1) // bs)
                    if packed and not deep else 0}
        key = tuple(sorted(sig.items()))
        if key not in _RECORDED_SHAPES:
            _RECORDED_SHAPES.add(key)
            _record_shape(sig)
        if packed and not deep:
            # ONE scan launch per cohort: stack the bs-sized batches.
            # Pad rows are probability-inert (same fills as the
            # per-launch path); the batch-count axis k pads to a small
            # bucket so the scan's trip count — part of the jit shape —
            # stays at a handful of compiled variants
            from .runtime.watchdog import beat

            beat()
            k = _bucket_k((n_rows + bs - 1) // bs)
            pad_rows = k * bs - n_rows

            def stacked(a, fill=0):
                if pad_rows:
                    padding = [(0, pad_rows)] + [(0, 0)] * (a.ndim - 1)
                    a = np.pad(a, padding, constant_values=fill)
                return a.reshape((k, bs) + a.shape[1:])

            args = shard_batch(
                (stacked(cand_site), stacked(cand_pos, -(1 << 30)),
                 stacked(norm, 1.0), stacked(lo_c), stacked(hi_c)), mesh,
                axis=1)
            probs = _snp_forward_group_scan(
                params, *payload, *args,
                s_pad=s_pad, n_pad=n_pad, e_pad=e_pad, h_pad=h_pad,
                t_pad=t_pad, m_pad=m_pad, R=int(R_b),
                seq_type=gf.seq_type, haploid=haploid)
            parts.append((dst_mi, dst_j, probs, n_rows))
            continue
        for lo in range(0, n_rows, bs):
            from .runtime.watchdog import beat

            beat()
            sel = slice(lo, min(lo + bs, n_rows))
            nsel = sel.stop - sel.start
            pad = bs - nsel

            def p(a, fill=0):
                if pad == 0:
                    return a[sel]
                padding = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                return np.pad(a[sel], padding, constant_values=fill)

            if deep:
                n_valid = np.full(n_rows, gf.maxcov, i32)
                args = shard_batch(
                    (p(cand_site), p(cand_pos, -(1 << 30)),
                     p(rids), p(n_valid),
                     p(norm, 1.0), p(lo_c), p(hi_c)), mesh)
                if packed:
                    probs = _snp_forward_group_deep_packed(
                        params, *payload, *args,
                        s_pad=s_pad, n_pad=n_pad, e_pad=e_pad,
                        h_pad=h_pad, t_pad=t_pad, m_pad=m_pad,
                        R=int(R_b), seq_type=gf.seq_type, haploid=haploid)
                else:
                    probs = _snp_forward_group_deep(
                        params, *payload, *args,
                        s_pad=s_pad, n_pad=n_pad, R=int(R_b),
                        seq_type=gf.seq_type, haploid=haploid)
            else:
                args = shard_batch(
                    (p(cand_site), p(cand_pos, -(1 << 30)),
                     p(norm, 1.0), p(lo_c), p(hi_c)), mesh)
                if packed:
                    probs = _snp_forward_group_packed(
                        params, *payload, *args,
                        s_pad=s_pad, n_pad=n_pad, e_pad=e_pad,
                        h_pad=h_pad, t_pad=t_pad, m_pad=m_pad,
                        R=int(R_b), seq_type=gf.seq_type, haploid=haploid)
                else:
                    probs = _snp_forward_group(
                        params, *payload, *args,
                        s_pad=s_pad, n_pad=n_pad, R=int(R_b),
                        seq_type=gf.seq_type, haploid=haploid)
            parts.append((dst_mi[sel], dst_j[sel], probs, nsel))

    def finish():
        for mis, js, probs, n in parts:
            pr = np.asarray(probs)
            if pr.ndim == 3:  # scanned cohort: (k, bs, 4)
                pr = pr.reshape(-1, pr.shape[-1])
            pr = pr[:n]
            for mi in np.unique(mis):
                m = mis == mi
                outs[mi][js[m]] = pr[m]
        return outs

    return finish if async_mode else finish()


def infer_snp_any(state, batch, cfg, ploidy, async_mode=False):
    """Dispatch on the batch representation (dense oracle vs dedup).

    async_mode=True returns a zero-arg finisher (see infer_snp_chunk);
    the dense path computes eagerly and the finisher is trivial."""
    from .pileup.snp_features import SnpChunkFeatures

    if isinstance(batch, SnpChunkFeatures):
        return infer_snp_chunk(state, batch, cfg, ploidy,
                               async_mode=async_mode)
    probs = infer_snp_batch(state, batch, cfg, ploidy)
    return (lambda: probs) if async_mode else probs


def decode_diploid(batch: SnpBatch, probs):
    """Genotype decision tree → VCF body lines (snpCaller.py:113-163)."""
    lines = []
    pred_sort = np.argsort(probs, axis=1)
    n_ge = (probs >= 0.5).sum(axis=1)
    for j in range(len(batch)):
        pos1 = int(batch.pos[j]) + 1
        ref = int(batch.center_ref[j])
        pj = probs[j]
        dp = int(batch.dp[j])
        info = "PR=" + ",".join("%.4f" % x for x in pj[[0, 3, 1, 2]]) + \
               ";FQ=%.4f" % batch.freq[j]
        fwd, rev = batch.fwd_dp[j], batch.rev_dp[j]
        ref_dp = (int(fwd[ref]), int(rev[ref]))
        pred1, pred2 = int(pred_sort[j, -1]), int(pred_sort[j, -2])

        def line(alt, qual, filt, gt, sample_tail):
            return "%s\t%d\t.\t%s\t%s\t%.3f\t%s\t%s\tGT:DP:VF:AD:ADF:ADR\t%s:%s\n" % (
                batch.contig, pos1, NUM_TO_BASE[ref], alt, qual, filt, info,
                gt, sample_tail)

        if n_ge[j] >= 2:  # het-like
            if pred1 == ref:
                alt = pred2
                alt_dp = (int(fwd[alt]), int(rev[alt]))
                qual = _phred(pj[alt])
                lines.append(line(
                    NUM_TO_BASE[alt], qual, "PASS", "0/1",
                    "%d:%.4f:%d,%d:%d,%d:%d,%d" % (
                        dp, sum(alt_dp) / dp, sum(ref_dp), sum(alt_dp),
                        ref_dp[0], alt_dp[0], ref_dp[1], alt_dp[1])))
            elif pred2 == ref and pj[pred2] >= 0.5:
                alt = pred1
                alt_dp = (int(fwd[alt]), int(rev[alt]))
                qual = _phred(pj[pred2])
                lines.append(line(
                    NUM_TO_BASE[alt], qual, "PASS", "0/1",
                    "%d:%.4f:%d,%d:%d,%d:%d,%d" % (
                        dp, sum(alt_dp) / dp, sum(ref_dp), sum(alt_dp),
                        ref_dp[0], alt_dp[0], ref_dp[1], alt_dp[1])))
            elif pred2 != ref and pred1 != ref and pj[pred2] >= 0.5:
                alt1_dp = (int(fwd[pred1]), int(rev[pred1]))
                alt2_dp = (int(fwd[pred2]), int(rev[pred2]))
                qual = _phred(pj[pred2])
                lines.append(line(
                    "%s,%s" % (NUM_TO_BASE[pred1], NUM_TO_BASE[pred2]),
                    qual, "PASS", "1/2",
                    "%d:%.4f,%.4f:%d,%d,%d:%d,%d,%d:%d,%d,%d" % (
                        dp, sum(alt1_dp) / dp, sum(alt2_dp) / dp,
                        sum(ref_dp), sum(alt1_dp), sum(alt2_dp),
                        ref_dp[0], alt1_dp[0], alt2_dp[0],
                        ref_dp[1], alt1_dp[1], alt2_dp[1])))
        elif n_ge[j] == 1 and ref != pred1 and pj[pred1] >= 0.5:  # hom-alt
            alt_dp = (int(fwd[pred1]), int(rev[pred1]))
            qual = _phred(pj[pred1])
            lines.append(line(
                NUM_TO_BASE[pred1], qual, "PASS", "1/1",
                "%d:%.4f:%d,%d:%d,%d:%d,%d" % (
                    dp, sum(alt_dp) / dp, sum(ref_dp), sum(alt_dp),
                    ref_dp[0], alt_dp[0], ref_dp[1], alt_dp[1])))
        else:
            if n_ge[j] == 1 and ref == pred1:
                qual = _phred(pj[pred1])
                lines.append(line(".", qual, "REF", "./.", "%d:.:.:.:." % dp))
            else:
                lines.append(line(".", 0.0, "LOW", "./.", "%d:.:.:.:." % dp))
    return lines


def decode_haploid(batch: SnpBatch, probs):
    """Haploid decode (snpCaller.py:187-198)."""
    lines = []
    preds = np.argmax(probs, axis=1)
    for j in range(len(batch)):
        pos1 = int(batch.pos[j]) + 1
        ref = int(batch.center_ref[j])
        pred = int(preds[j])
        pj = probs[j]
        info = "PR=" + ",".join("%.4f" % x for x in pj[[0, 3, 1, 2]]) + \
               ";FQ=%.4f" % batch.freq[j]
        qual = _phred(pj[pred], cap=999, scale=100)
        filt = "PASS" if pred != ref else "REF"
        lines.append(
            "%s\t%d\t.\t%s\t%s\t%.3f\t%s\t%s\tGT:DP:VF:AD:ADF:ADR\t%s:%d:%.4f:.:.:.\n"
            % (batch.contig, pos1, NUM_TO_BASE[ref], NUM_TO_BASE[pred], qual,
               filt, info, "1/1", int(batch.dp[j]), batch.freq[j]))
    return lines


def call_chunk(state, bam, fasta, chunk, cfg, exclude=None):
    """Feature-gen + inference + decode for one chunk → VCF body lines."""
    from .pileup.snp_features import get_snp_chunk_features

    ploidy = chunk.get("ploidy", "diploid")
    builder = get_snp_chunk_features \
        if getattr(cfg, "dedup_transfer", True) else get_snp_candidates
    batch = builder(
        bam, fasta, chunk,
        seq_type=cfg.sequencing, mincov=cfg.mincov, maxcov=cfg.maxcov,
        min_allele_freq=cfg.min_allele_freq, min_nbr_sites=cfg.min_nbr_sites,
        threshold=cfg.threshold, ploidy=ploidy, exclude=exclude)
    if len(batch) == 0:
        return []
    probs = infer_snp_any(state, batch, cfg, ploidy)
    if ploidy == "haploid":
        return decode_haploid(batch, probs)
    return decode_diploid(batch, probs)


def _group_adjacent(ordered_chunks, todo, cfg):
    """Pack coordinate-adjacent pending chunks into shared-decode groups
    for snp_features_group_worker; None disables grouping
    (cfg.snp_group_span <= -1, used by tests pinning the per-chunk path).

    Group span adapts to keep ≥ ~4 tasks per feature worker for load
    balance while amortizing the ±50 kb halo re-decode and per-window
    decode setup (VERDICT r3 next-1a). Groups never span contigs, gaps
    (e.g. chunks completed by --resume), or ploidy changes — member
    scans are byte-identical to per-chunk scans either way."""
    from .runtime.chunker import group_adjacent_chunks

    span_cap = int(getattr(cfg, "snp_group_span", 0) or 0)
    if span_cap <= -1:
        return None
    if span_cap == 0:
        total = sum(c["end"] - c["start"] + 1 for c in ordered_chunks)
        span_cap = max(500_000,
                       min(8_000_000, total // max(1, 4 * cfg.cpu)))
    return group_adjacent_chunks(ordered_chunks, todo, span_cap)


def call_snps(cfg, bam, fasta, regions_list, chunks, out_dir, exclude=None,
              progress=None, exclude_path=None, manifest=None, metrics=None):
    """Run SNP calling over all chunks; write unfiltered + PASS VCFs.

    Feature generation fans out over cfg.cpu worker processes while this
    process owns the device and runs batched inference as batches stream
    in (runtime/scheduler.py). With a RunManifest, completed chunks are
    reloaded from their shard files (idempotent restart — the capability
    the reference lacks, SURVEY.md §5.4). Returns the PASS VCF path (the
    reference's return contract, snpCaller.py:287).
    """
    import os

    from .runtime.scheduler import feature_stream
    from .runtime.workers import cfg_kwargs_for_workers, snp_features_worker

    state = SnpCallerState.create(cfg.snp_model)
    contigs = list(dict.fromkeys(x[0] for x in regions_list))
    order = sorted(range(len(chunks)),
                   key=lambda i: (contigs.index(chunks[i]["chrom"]),
                                  chunks[i]["start"]))
    ordered_chunks = [chunks[i] for i in order]
    ploidy_of = [c.get("ploidy", "diploid") for c in ordered_chunks]

    results = {}
    todo = []
    for idx, chunk in enumerate(ordered_chunks):
        if manifest is not None and manifest.is_done("snp", chunk):
            with open(manifest.shard_path("snp", chunk)) as fh:
                results[idx] = fh.readlines()
            if progress:
                progress(1)
        else:
            todo.append(idx)

    # probe depth on a small window → prewarm the matching read-axis
    # bucket while feature workers run (overlaps compilation with host
    # work). Skipped on the axon backend (its remote-compile channel
    # does not tolerate a concurrent background compile) and on fully-
    # resumed runs (nothing to infer). The thread is joined before
    # returning: letting the interpreter tear down mid-compile
    # segfaults at exit.
    prewarm_thread = None
    preload_thread = None
    if todo and getattr(cfg, "dedup_transfer", True):
        # warm this machine's remembered dedup-kernel shapes from the
        # persistent compilation cache while feature workers run
        preload_thread = preload_remembered_shapes(state, cfg)
    try:
        import jax

        if not todo or jax.default_backend() == "axon" \
                or getattr(cfg, "dedup_transfer", True):
            # dedup runs use the gather kernels whose shapes depend on
            # per-chunk data (compile-aware buckets + persistent cache
            # cover them); warming the dense kernel would just contend
            raise RuntimeError("prewarm not needed")
        from .runtime.chunker import get_coverage

        c0 = ordered_chunks[todo[0]]
        cov = get_coverage(bam, c0["chrom"], c0["start"],
                           min(c0["end"], c0["start"] + 20000))
        bucket = next((b for b in _R_BUCKETS
                       if b >= min(1.6 * cov, cfg.maxcov)), _R_BUCKETS[-1])
        prewarm_thread = prewarm_snp_model(
            state, cfg, buckets=(bucket,),
            diploid=any(p == "diploid" for p in ploidy_of),
            haploid=any(p == "haploid" for p in ploidy_of))
    except Exception:
        pass
    # depth-1 inference pipeline: chunk i's launches are dispatched
    # asynchronously and its device→host sync + decode happen while
    # chunk i+1's features are produced/dispatched — a synchronous
    # per-chunk round trip otherwise serializes launch latency across
    # hundreds of chunks (dominant on the tunnel)
    in_flight = []  # [("chunk", idx, batch, fin) | ("group", gf, fin)]

    def _store(idx, lines):
        results[idx] = lines
        if manifest is not None:
            chunk = ordered_chunks[idx]
            shard = os.path.join(
                manifest.shard_dir, "snp_%s_%d.body" % (chunk["chrom"],
                                                        chunk["start"]))
            with open(shard, "w") as fh:
                fh.writelines(lines)
            manifest.mark_done("snp", chunk, shard)
        if progress:
            progress(1)

    def _finalize_one():
        head = in_flight.pop(0)
        if head[0] == "group":
            _, gf, finish = head
            outs = finish()
            for (oi, sec), probs in zip(gf.members, outs):
                if sec is None or len(sec) == 0:
                    _store(oi, [])
                elif sec.ploidy == "haploid":
                    _store(oi, decode_haploid(sec, probs))
                else:
                    _store(oi, decode_diploid(sec, probs))
            return
        _, idx, batch, finish = head
        if finish is None:
            lines = []
        else:
            probs = finish()
            if ploidy_of[idx] == "haploid":
                lines = decode_haploid(batch, probs)
            else:
                lines = decode_diploid(batch, probs)
        _store(idx, lines)

    # pipeline depth: how many dispatched-but-unsynced units ride the
    # device queue. Depth 1 already overlaps unit i's d2h with unit
    # i+1's feature gen; deeper hides d2h LATENCY spikes (the tunnel's
    # sick direction during freeze waves) behind 2-3 units of compute.
    # Results are stored by idx, so depth cannot affect output order.
    depth = max(1, int(getattr(cfg, "snp_pipeline_depth", 1)))

    def process(idx, batch):
        if metrics is not None:
            metrics.count("snp_candidates", len(batch))
        finish = None
        if len(batch):
            finish = infer_snp_any(state, batch, cfg, ploidy_of[idx],
                                   async_mode=True)
        while len(in_flight) >= depth:
            _finalize_one()
        in_flight.append(("chunk", idx, batch, finish))

    def process_group(gf):
        if metrics is not None:
            metrics.count("snp_candidates", len(gf))
        finish = infer_snp_group(state, gf, cfg, async_mode=True)
        while len(in_flight) >= depth:
            _finalize_one()
        in_flight.append(("group", gf, finish))

    init_args = (cfg.bam, cfg.ref, cfg_kwargs_for_workers(cfg), exclude_path)
    groups = _group_adjacent(ordered_chunks, todo, cfg)
    if groups is not None:
        from .pileup.snp_features import SnpGroupFeatures
        from .runtime.workers import snp_features_group_worker

        for _, members in feature_stream(groups, snp_features_group_worker,
                                         init_args, cfg.cpu):
            if isinstance(members, SnpGroupFeatures):
                process_group(members)
                continue
            for idx, batch in members:
                process(idx, batch)
    else:
        for sub_idx, batch in feature_stream(
                [ordered_chunks[i] for i in todo], snp_features_worker,
                init_args, cfg.cpu):
            process(todo[sub_idx], batch)
    while in_flight:  # drain the inference pipeline
        _finalize_one()

    if prewarm_thread is not None:
        prewarm_thread.join()
    if preload_thread is not None:
        preload_thread.join()
    header = standard_snp_header(contigs, cfg.sample)
    all_path = os.path.join(out_dir, "%s.unfiltered.snps.vcf.gz" % cfg.prefix)
    pass_path = os.path.join(out_dir, "%s.snps.vcf.gz" % cfg.prefix)
    with VcfWriter(all_path, header) as w:
        for idx in range(len(ordered_chunks)):
            for ln in results.get(idx, []):
                w.write(ln)
    view_filter(all_path, pass_path, lambda r: r.filter == "PASS")
    return pass_path
