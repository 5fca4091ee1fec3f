"""Progressive MSA oracle — MUSCLE-3.8-shaped (VERDICT round-1 item #1).

The reference defines its indel tensors by piping read windows + the ref
window through `muscle -quiet -gapopen 1.0 -maxiters 1 -diags1`
(/root/reference/nanocaller_src/generate_indel_pileups.py:29-31). Our
production path is a star MSA around the reference window
(align/msa.py) — a different algorithm. MUSCLE itself is not in this
image, so this module reimplements the algorithm MUSCLE 3.8 runs at
`-maxiters 1` as a slow test oracle:

    1. pairwise k-mer distances (fractional common k-mer count, k=6,
       4-letter alphabet — MUSCLE's Kmer4_6 stage-1 distance),
    2. UPGMA guide tree (average linkage, deterministic tie-breaks),
    3. progressive profile-profile global alignment up the tree
       (affine gaps, position-specific open scaled by the opposing
       profile's non-gap fraction — MUSCLE's gap-fraction scaling).

Two deliberate, documented deviations from bit-faithful MUSCLE:
  - `-diags1` is a speed heuristic (k-mer diagonal anchoring) that
    restricts the DP; the oracle runs the full DP (same objective).
  - exact scoring constants: MUSCLE's internal nucleotide matrix and
    the semantics of the reference's positive `-gapopen 1.0` cannot be
    verified without the binary (zero egress). The oracle defaults to
    the standard +5/−4 DNA matrix with a near-zero gap-open (matching
    the reference's 1.0) and the divergence harness
    (tools/msa_divergence.py) sweeps gap parameters to show final-call
    concordance is insensitive across the plausible envelope.

Unlike the star MSA (ref = fixed center), the ref window here is an
ordinary row placed by the guide tree — the structurally honest model
of what MUSCLE does with `ref_SEQ`.
"""

from __future__ import annotations

import numpy as np

from .msa import MSA_WIDTH, msa_sample, msa_tensor

# near-zero open mirrors the reference's `-gapopen 1.0` (a tiny value on
# MUSCLE's score scale); extend 1 keeps long gaps mildly discouraged.
PROG_MATCH = 5
PROG_MISMATCH = -4
PROG_GAP_OPEN = 1
PROG_GAP_EXTEND = 1

_MAP = {"A": 0, "G": 1, "T": 2, "C": 3, "-": 4}
_CODE_LUT = np.full(256, 4, dtype=np.int8)
for _b, _c in _MAP.items():
    _CODE_LUT[ord(_b)] = _c


def _codes(seq):
    return _CODE_LUT[np.frombuffer(seq.encode(), dtype=np.uint8)]


def kmer_distance_matrix(seqs, k=6):
    """1 − fractional common k-mer count (MUSCLE Kmer4_6 shape).

    F(a,b) = Σ_kmer min(n_a, n_b) / (min(|a|,|b|) − k + 1); sequences
    shorter than k get distance 1 to everything (no shared k-mers).
    """
    n = len(seqs)
    counts = []
    for s in seqs:
        c = _codes(s)
        if len(c) < k or (c == 4).any():
            c = c[c < 4]
        if len(c) < k:
            counts.append({})
            continue
        # pack k consecutive 2-bit codes into one integer key
        keys = np.zeros(len(c) - k + 1, dtype=np.int64)
        for i in range(k):
            keys = keys * 4 + c[i : len(c) - k + 1 + i]
        uniq, cnt = np.unique(keys, return_counts=True)
        counts.append(dict(zip(uniq.tolist(), cnt.tolist())))
    D = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            ci, cj = counts[i], counts[j]
            if not ci or not cj:
                D[i, j] = D[j, i] = 1.0
                continue
            if len(cj) < len(ci):
                ci, cj = cj, ci
            common = sum(min(v, cj[key]) for key, v in ci.items() if key in cj)
            denom = min(len(seqs[i]), len(seqs[j])) - k + 1
            F = common / denom if denom > 0 else 0.0
            D[i, j] = D[j, i] = 1.0 - min(F, 1.0)
    return D


def upgma(D):
    """Average-linkage UPGMA; returns merge list [(a, b)] over node ids
    (leaves 0..n−1, internal n..2n−2, children always lower id)."""
    n = D.shape[0]
    if n == 1:
        return []
    active = list(range(n))
    sizes = {i: 1 for i in range(n)}
    dist = {}
    for i in range(n):
        for j in range(i + 1, n):
            dist[(i, j)] = D[i, j]
    merges = []
    next_id = n
    while len(active) > 1:
        best = None
        for ai in range(len(active)):
            for aj in range(ai + 1, len(active)):
                a, b = active[ai], active[aj]
                d = dist[(min(a, b), max(a, b))]
                if best is None or d < best[0] - 1e-15:
                    best = (d, a, b)
        _, a, b = best
        new = next_id
        next_id += 1
        merges.append((a, b))
        active = [x for x in active if x not in (a, b)]
        for x in active:
            da = dist[(min(a, x), max(a, x))]
            db = dist[(min(b, x), max(b, x))]
            dist[(min(new, x), max(new, x))] = (
                sizes[a] * da + sizes[b] * db) / (sizes[a] + sizes[b])
        sizes[new] = sizes[a] + sizes[b]
        active.append(new)
    return merges


def _profile_of(rows):
    """(L, 5) float64 column frequencies (incl. gap channel)."""
    mat = np.stack([_CODE_LUT[np.frombuffer(r, dtype=np.uint8)]
                    for r in rows])
    return np.eye(5, dtype=np.float64)[mat].mean(axis=0)


def profile_align(pa, pb, match=PROG_MATCH, mismatch=PROG_MISMATCH,
                  gap_open=PROG_GAP_OPEN, gap_extend=PROG_GAP_EXTEND):
    """Affine global profile-profile alignment.

    pa: (La,5), pb: (Lb,5). Column pair score is the SP residue term
    Σ_xy fa_x fb_y M(x,y); gap-open against a profile column is scaled
    by that column's non-gap fraction (aligning a new gap to an already
    gappy column is cheap — MUSCLE's gap-fraction scaling). Returns two
    boolean arrays (take_a, take_b) over merged columns.
    """
    La, Lb = pa.shape[0], pb.shape[0]
    M = np.full((4, 4), float(mismatch))
    np.fill_diagonal(M, float(match))
    # residue-pair SP term: (La, Lb)
    S = pa[:, :4] @ M @ pb[:, :4].T
    occ_a = pa[:, :4].sum(axis=1)  # non-gap fraction per column of a
    occ_b = pb[:, :4].sum(axis=1)
    open_a = gap_open * occ_a  # opening a gap IN b against column of a
    open_b = gap_open * occ_b
    ext_a = gap_extend * occ_a
    ext_b = gap_extend * occ_b
    Cb = np.concatenate([[0.0], np.cumsum(ext_b)])  # Cb[j] = Σ ext_b[:j]

    NEG = -1e15
    # Gotoh: H ends in a column pair, E ends gap-in-b (consumes a),
    # F ends gap-in-a (consumes b). Full matrices kept for traceback.
    H = np.full((La + 1, Lb + 1), NEG)
    E = np.full((La + 1, Lb + 1), NEG)
    F = np.full((La + 1, Lb + 1), NEG)
    H[0, 0] = 0.0
    if La:
        E[1:, 0] = -(open_a[0] + np.cumsum(ext_a))
    if Lb:
        F[0, 1:] = -(open_b[0] + np.cumsum(ext_b))
    for i in range(1, La + 1):
        # H[i, 1:]: diagonal from any state at (i-1, j-1)
        diag = np.maximum(np.maximum(H[i - 1, :-1], E[i - 1, :-1]),
                          F[i - 1, :-1])
        H[i, 1:] = diag + S[i - 1]
        # E[i, :]: vertical from (i-1, j)
        E[i] = (np.maximum(
            np.maximum(H[i - 1], F[i - 1]) - open_a[i - 1], E[i - 1])
            - ext_a[i - 1])
        # F[i, j] = max(max(H,E)[i, j-1] - open_b[j-1], F[i, j-1]) - ext_b[j-1]
        # max-plus prefix scan: G[j] = F[i, j] + Cb[j] is a running max of
        # base[j-1] + Cb[j-1] with base = max(H, E) - open_b.
        base = np.maximum(H[i, :-1], E[i, :-1]) - open_b
        G = np.maximum.accumulate(
            np.concatenate([[F[i, 0] + Cb[0]], base + Cb[:-1]]))
        F[i] = G - Cb
    # traceback (re-derive decisions from stored values)
    take_a, take_b = [], []
    i, j = La, Lb
    state = int(np.argmax([H[i, j], E[i, j], F[i, j]]))
    while i > 0 or j > 0:
        if i == 0:
            state = 2
        elif j == 0:
            state = 1
        if state == 0:  # H consumed (a_i, b_j)
            take_a.append(True)
            take_b.append(True)
            i, j = i - 1, j - 1
            state = int(np.argmax([H[i, j], E[i, j], F[i, j]]))
        elif state == 1:  # E consumed a_i (gap in b)
            take_a.append(True)
            take_b.append(False)
            came_ext = E[i, j] == E[i - 1, j] - ext_a[i - 1]
            if came_ext:
                state = 1
            else:
                state = 0 if H[i - 1, j] >= F[i - 1, j] else 2
            i -= 1
        else:  # F consumed b_j (gap in a)
            take_a.append(False)
            take_b.append(True)
            came_ext = F[i, j] == F[i, j - 1] - ext_b[j - 1]
            if came_ext:
                state = 2
            else:
                state = 0 if H[i, j - 1] >= E[i, j - 1] else 1
            j -= 1
    return (np.array(take_a[::-1], dtype=bool),
            np.array(take_b[::-1], dtype=bool))


def _expand_rows(rows, take):
    """Insert '-' columns where take is False."""
    L = len(take)
    idx = np.flatnonzero(take)
    out = []
    for r in rows:
        arr = np.full(L, ord("-"), dtype=np.uint8)
        arr[idx] = np.frombuffer(r, dtype=np.uint8)
        out.append(arr.tobytes())
    return out


def progressive_msa(seqs, match=PROG_MATCH, mismatch=PROG_MISMATCH,
                    gap_open=PROG_GAP_OPEN, gap_extend=PROG_GAP_EXTEND,
                    k=6):
    """Full progressive MSA; returns aligned rows (str, same order as
    seqs). Empty input sequences are not supported (filter upstream)."""
    n = len(seqs)
    if n == 0:
        return []
    if n == 1:
        return [seqs[0]]
    D = kmer_distance_matrix(seqs, k=k)
    merges = upgma(D)
    # node id → (member indices, aligned byte rows)
    nodes = {i: ([i], [seqs[i].encode()]) for i in range(n)}
    next_id = n
    for a, b in merges:
        ma, ra = nodes.pop(a)
        mb, rb = nodes.pop(b)
        take_a, take_b = profile_align(
            _profile_of(ra), _profile_of(rb),
            match=match, mismatch=mismatch,
            gap_open=gap_open, gap_extend=gap_extend)
        rows = _expand_rows(ra, take_a) + _expand_rows(rb, take_b)
        nodes[next_id] = (ma + mb, rows)
        next_id += 1
    members, rows = nodes.popitem()[1]
    order = np.argsort(members)
    return [rows[i].decode() for i in order]


def prog_msa(seq_list, ref, v_pos, mincov, maxcov, **params):
    """Drop-in for align.msa.star_msa with the progressive oracle.

    Same contract: (flag, flag, tensor (5,128,2), consensus, ref) or
    (0,0,None,None,None). The ref window participates as an ordinary
    MSA row (as MUSCLE's ref_SEQ does); the tensor/consensus math is
    the shared msa_tensor (generate_indel_pileups.py:53-73 parity).
    """
    sample = msa_sample(seq_list, v_pos, maxcov)
    if len(sample) < mincov:
        return (0, 0, None, None, None)
    seqs = [seq_list[name] for name in sample if seq_list[name]]
    if len(seqs) < mincov:
        return (0, 0, None, None, None)
    rows = progressive_msa(seqs + [ref], **params)
    tensor, cns, ref_degapped = msa_tensor(rows[:-1], rows[-1])
    return (1, 1, tensor, cns, ref_degapped)
