"""CI-style smoke tests for the real-data readiness kit (VERDICT r2
item 6): tools/bench_e2e.py and tools/real_data_eval.py must keep
working against the synthetic simulator fixture so they cannot bit-rot
before real HG002 data appears. Both drive the full CLI in a
subprocess (CPU platform) exactly as they would on real data.
"""

import contextlib
import io
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")


@pytest.fixture(scope="module")
def sim_fixture(tmp_path_factory):
    """A small simulator fixture with truth VCF (tools/simulate.py)."""
    sys.path.insert(0, TOOLS)
    from simulate import main as sim_main

    wd = str(tmp_path_factory.mktemp("kit"))
    sim_main(["--output", wd, "--length", "60000", "--depth", "30",
              "--read_len", "3000", "--error_rate", "0.02",
              "--indel_error_rate", "0.002", "--seed", "7"])
    return wd


def _capture_last_json(fn, argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(argv)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    return json.loads(lines[-1]), buf.getvalue()


class TestBenchE2E:
    def test_smoke(self, sim_fixture):
        sys.path.insert(0, TOOLS)
        from bench_e2e import main as bench_main

        out, text = _capture_last_json(
            bench_main,
            ["--workdir", sim_fixture, "--mb", "0.06", "--cpu", "1",
             "--platform", "cpu"])
        assert out["wall_s"] > 0
        assert "snp_calling" in out["stages"]
        assert out["counts"].get("snp_candidates", 0) > 0
        assert out["rates"].get("snp_sites_per_s", 0) > 0
        assert out["counts"].get("indel_candidates", 0) > 0
        # accuracy keys present and sane on the clean tiny fixture
        assert out["results"]["snp"]["f1"] is not None
        assert out["results"]["snp"]["f1"] > 0.5


class TestRealDataEval:
    def test_smoke_config(self, sim_fixture, tmp_path):
        sys.path.insert(0, TOOLS)
        from real_data_eval import main as eval_main

        out_dir = str(tmp_path / "eval")
        out, text = _capture_last_json(
            eval_main,
            ["--bam", os.path.join(sim_fixture, "reads.bam"),
             "--ref", os.path.join(sim_fixture, "ref.fa"),
             "--truth", os.path.join(sim_fixture, "truth.vcf.gz"),
             "--out", out_dir, "--sample", "S", "--cpu", "1",
             "--platform", "cpu", "--configs", "smoke"])
        assert "smoke" in out
        res = out["smoke"]["results"]
        assert "snp" in res and "indel" in res
        assert res["snp"].get("f1", 0) > 0.5
        # per-config artifacts written with the standard contract
        assert os.path.exists(os.path.join(out_dir, "smoke", "v.vcf.gz"))
        assert os.path.exists(
            os.path.join(out_dir, "smoke", "eval_snp.json"))
