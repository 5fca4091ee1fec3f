"""Real-TPU benchmark: Pallas NW kernel vs XLA lax.scan formulation.

Closes VERDICT r1 item 5 — runs `align/pallas_nw.py` on the actual chip
at production shapes (the indel path's dominant bucket is 192x192, B up
to 1024; reference analog: one parasail/MUSCLE call per read window,
generate_indel_pileups.py:10,77-80), asserts the two formulations'
traceback matrices are identical ON DEVICE, and times:

  - DP-only (tb matrix stays on device)
  - end-to-end BatchAligner.align_many (device walk, cigars out)

Usage: python tools/bench_align.py [--batches 256,1024] [--size 192]
Prints a small JSON report; paste the table into RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pairs(rng, n, size, mutate=0.12):
    alpha = np.array(list("ACGT"))
    pairs = []
    for _ in range(n):
        rlen = int(rng.integers(size - 40, size - 2))
        ref = alpha[rng.integers(0, 4, rlen)]
        q = ref.copy()
        # substitutions
        subs = rng.random(rlen) < mutate * 0.6
        q[subs] = alpha[rng.integers(0, 4, int(subs.sum()))]
        # an indel or two
        q = list(q)
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(1, len(q) - 1))
            if rng.random() < 0.5:
                del q[p : p + int(rng.integers(1, 4))]
            else:
                q[p:p] = list(alpha[rng.integers(0, 4, int(rng.integers(1, 4)))])
        pairs.append(("".join(q[:size]), "".join(ref)))
    return pairs


def timeit(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,1024")
    ap.add_argument("--size", type=int, default=192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nanocaller_tpu.align.batch_nw import BatchAligner, _batch_nw
    from nanocaller_tpu.align.nw import _CHAR_CODE
    from nanocaller_tpu.align.pallas_nw import batch_nw_tb_pallas

    backend = jax.default_backend()
    interpret = backend == "cpu"
    rng = np.random.default_rng(0)
    Q = R = args.size
    W = max(128, -(-(R + 1) // 128) * 128)
    m, x, go, ge = 20, -10, 9, 1
    report = {"backend": backend, "size": args.size, "rows": []}

    for B in [int(b) for b in args.batches.split(",")]:
        pairs = make_pairs(rng, B, args.size)
        qcodes = np.full((B, Q), 4, np.int8)
        rcodes = np.full((B, R), 4, np.int8)
        for b, (q, r) in enumerate(pairs):
            qa = _CHAR_CODE[np.frombuffer(q.encode(), dtype=np.uint8)]
            ra = _CHAR_CODE[np.frombuffer(r.encode(), dtype=np.uint8)]
            qcodes[b, : len(qa)] = qa
            rcodes[b, : len(ra)] = ra
        qj, rj = jnp.asarray(qcodes), jnp.asarray(rcodes)

        def run_pallas():
            return batch_nw_tb_pallas(qj, rj, m, x, go, ge, Q, W,
                                      interpret=interpret).block_until_ready()

        def run_xla():
            return _batch_nw(qj, rj, m, x, go, ge, Q, R)[1].block_until_ready()

        print("B=%d: compiling pallas..." % B, file=sys.stderr, flush=True)
        tb_p = run_pallas()  # warmup + value
        print("B=%d: compiling xla..." % B, file=sys.stderr, flush=True)
        tb_x = run_xla()
        print("B=%d: timing..." % B, file=sys.stderr, flush=True)
        # on-device identity over the meaningful lanes
        same = bool(jnp.all(tb_p[:, :, : R + 1].astype(jnp.uint8)
                            == tb_x))
        t_pallas = timeit(run_pallas)
        t_xla = timeit(run_xla)

        print("B=%d: e2e align_many..." % B, file=sys.stderr, flush=True)
        al_p = BatchAligner(use_pallas=not interpret, device_walk=True)
        al_x = BatchAligner(use_pallas=False, device_walk=True)
        cig_p = al_p.align_many(pairs)
        cig_x = al_x.align_many(pairs)
        t_e2e_p = timeit(lambda: al_p.align_many(pairs), reps=3)
        t_e2e_x = timeit(lambda: al_x.align_many(pairs), reps=3)

        cells = B * Q * R
        row = {
            "B": B,
            "tb_identical_on_device": same,
            "cigars_identical": cig_p == cig_x,
            "dp_pallas_ms": round(t_pallas * 1e3, 2),
            "dp_xla_ms": round(t_xla * 1e3, 2),
            "dp_pallas_gcups": round(cells / t_pallas / 1e9, 2),
            "dp_xla_gcups": round(cells / t_xla / 1e9, 2),
            "e2e_pallas_ms": round(t_e2e_p * 1e3, 1),
            "e2e_xla_ms": round(t_e2e_x * 1e3, 1),
        }
        report["rows"].append(row)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
