import numpy as np
import pytest

from nanocaller_tpu.align.batch_nw import BatchAligner, _batch_nw
from nanocaller_tpu.align.nw import nw_align, score_alignment

from test_align import rand_seq


class TestBatchNW:
    def test_cigars_identical_to_numpy(self):
        rng = np.random.default_rng(77)
        pairs = []
        for _ in range(30):
            r = rand_seq(rng, int(rng.integers(20, 150)))
            q = list(r)
            for _ in range(int(rng.integers(0, 5))):
                p = int(rng.integers(0, max(1, len(q) - 6)))
                kind = rng.integers(0, 3)
                if kind == 0:
                    q[p] = rand_seq(rng, 1)
                elif kind == 1:
                    q.insert(p, rand_seq(rng, int(rng.integers(1, 5))))
                else:
                    del q[p : p + int(rng.integers(1, 5))]
            pairs.append(("".join(q), r))
        # add some unrelated pairs and edge sizes
        pairs.append((rand_seq(rng, 5), rand_seq(rng, 70)))
        pairs.append((rand_seq(rng, 70), rand_seq(rng, 5)))
        pairs.append((rand_seq(rng, 64), rand_seq(rng, 64)))

        aligner = BatchAligner()
        got = aligner.align_many(pairs)
        for k, (q, r) in enumerate(pairs):
            want_score, want_cigar = nw_align(q, r)
            assert got[k] == want_cigar, (k, q, r)
            assert score_alignment(got[k], q, r) == want_score

    def test_msa_params(self):
        rng = np.random.default_rng(3)
        aligner = BatchAligner(match=5, mismatch=-4, gap_open=8, gap_extend=1)
        pairs = []
        for _ in range(10):
            r = rand_seq(rng, 100)
            q = r[:40] + "TTTT" + r[40:95]
            pairs.append((q, r))
        got = aligner.align_many(pairs)
        for k, (q, r) in enumerate(pairs):
            want = nw_align(q, r, match=5, mismatch=-4, gap_open=8,
                            gap_extend=1)
            assert got[k] == want[1]

    def test_oversize_falls_back(self):
        rng = np.random.default_rng(5)
        q = rand_seq(rng, 600)
        r = rand_seq(rng, 600)
        aligner = BatchAligner()
        got = aligner.align_many([(q, r)])
        assert got[0] == nw_align(q, r)[1]


class TestDeviceWalk:
    """Device-side traceback walk (_walk_device): cigars must be
    identical to the host tb-matrix walk / numpy oracle. On the real
    chip this path replaces a 12.6 MB tb transfer with a ~100x smaller
    op stream (RESULTS.md round 2)."""

    def test_cigars_identical_random(self):
        rng = np.random.default_rng(17)
        pairs = []
        for _ in range(40):
            n = int(rng.integers(20, 180))
            r = rand_seq(rng, n)
            q = list(r)
            # random edits
            for _ in range(int(rng.integers(0, 8))):
                p = int(rng.integers(0, len(q)))
                mode = rng.integers(0, 3)
                if mode == 0:
                    q[p] = "ACGT"[int(rng.integers(0, 4))]
                elif mode == 1:
                    q.insert(p, "ACGT"[int(rng.integers(0, 4))])
                elif len(q) > 5:
                    del q[p]
            pairs.append(("".join(q), r))
        pairs.append(("A" * 30, "A" * 30))          # all-match
        pairs.append(("A" * 10, "A" * 40))          # long deletion
        pairs.append(("C" * 40, "C" * 10))          # long insertion
        dev = BatchAligner(use_pallas=False, device_walk=True)
        host = BatchAligner(use_pallas=False, device_walk=False)
        got_d = dev.align_many(pairs)
        got_h = host.align_many(pairs)
        for k, (q, r) in enumerate(pairs):
            assert got_d[k] == got_h[k], (k, q, r)
            assert got_d[k] == nw_align(q, r)[1], (k, q, r)

    def test_msa_params_device_walk(self):
        rng = np.random.default_rng(23)
        dev = BatchAligner(match=5, mismatch=-4, gap_open=8, gap_extend=1,
                           use_pallas=False, device_walk=True)
        pairs = []
        for _ in range(8):
            r = rand_seq(rng, 120)
            q = r[:30] + r[36:80] + "GG" + r[80:]
            pairs.append((q, r))
        got = dev.align_many(pairs)
        for k, (q, r) in enumerate(pairs):
            want = nw_align(q, r, match=5, mismatch=-4, gap_open=8,
                            gap_extend=1)
            assert got[k] == want[1]
