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
