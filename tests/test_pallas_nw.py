import numpy as np
import pytest

from nanocaller_tpu.align.batch_nw import _batch_nw
from nanocaller_tpu.align.pallas_nw import batch_nw_tb_pallas


class TestPallasNW:
    @pytest.mark.parametrize("params", [(20, -10, 9, 1), (5, -4, 8, 1)])
    def test_tb_matches_xla(self, params):
        rng = np.random.default_rng(1)
        B, Q, R, W = 8, 48, 40, 64
        qc = rng.integers(0, 5, (B, Q)).astype(np.int8)
        rc = rng.integers(0, 5, (B, R)).astype(np.int8)
        m, x, go, ge = params
        _, tb_want = _batch_nw(qc, rc, m, x, go, ge, Q, R)
        tb_got = batch_nw_tb_pallas(qc, rc, m, x, go, ge, Q, W,
                                    interpret=True)
        np.testing.assert_array_equal(
            np.asarray(tb_got)[:, :, : R + 1], np.asarray(tb_want))
