"""Reproducible end-to-end benchmark driver (VERDICT r1 item 8).

One command regenerates the RESULTS.md wall-clock + accuracy table:
fixed-seed fixture generation (tools/simulate.py), a full `--mode all`
CLI run, per-stage timings from metrics.json, and haplotype-aware F1
against the planted truth (tools/vcf_compare.py --ref).

    python tools/bench_e2e.py --mb 20 --depth 45 --cpu 2
    python tools/bench_e2e.py --mb 20 --hp_profile        # stratified
    python tools/bench_e2e.py --mb 50 --platform cpu      # tunnel down

Prints a human-readable table and ONE final JSON line. Wall-clock on
the axon tunnel is wave-prone (RESULTS.md) — rerun / best-of-N for
timing claims; accuracy numbers are deterministic for a given seed.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_cli(bam, ref, out_dir, cpu, platform, extra=()):
    """Drive the CLI in a subprocess; platform 'cpu' overrides the
    sitecustomize-pinned axon backend via jax.config (the env var alone
    does not work — CLAUDE.md)."""
    code = (
        "import jax\n"
        + ("jax.config.update('jax_platforms', 'cpu')\n"
           if platform == "cpu" else "")
        + "import sys\n"
        + "sys.argv = %r\n" % (
            ["nanocaller-tpu", "--bam", bam, "--ref", ref, "--mode", "all",
             "--output", out_dir, "--prefix", "v", "--sample", "S",
             "--cpu", str(cpu)] + list(extra))
        + "from nanocaller_tpu.cli import main\nmain()\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    subprocess.run([sys.executable, "-c", code], check=True, env=env)
    return time.time() - t0


def evaluate(calls, truth, fasta, vtype, bed=None):
    from vcf_compare import main as vc_main

    argv = ["--calls", calls, "--truth", truth, "--ref", fasta,
            "--type", vtype, "--json"]
    if bed:
        argv += ["--bed", bed]
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        vc_main(argv)
    best = json.loads(buf.getvalue().strip().splitlines()[-1])["best"]
    return best or {}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=20, help="fixture Mb")
    ap.add_argument("--contigs", type=int, default=1,
                    help="split the fixture across N contigs (exercises "
                         "the DAG's cross-contig phase/indel overlap)")
    ap.add_argument("--depth", type=int, default=45)
    ap.add_argument("--error_rate", type=float, default=0.04)
    ap.add_argument("--indel_error_rate", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--cpu", type=int, default=2)
    ap.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--hp_profile", action="store_true")
    ap.add_argument("--workdir", default=None,
                    help="reuse an existing fixture/work directory")
    ap.add_argument("--skip_phased_bam", action="store_true")
    ap.add_argument("--watchdog", type=int, default=0,
                    help="pass through to the CLI: supervise the run and "
                         "resume in a fresh process on tunnel stalls")
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from simulate import main as sim_main

    wd = args.workdir or os.path.join(
        "/tmp", "bench_e2e_%dmb_s%d%s%s" % (
            int(args.mb), args.seed, "_hp" if args.hp_profile else "",
            "_c%d" % args.contigs if args.contigs > 1 else ""))
    os.makedirs(wd, exist_ok=True)
    fixture_args = [
        "--output", wd, "--length", str(int(args.mb * 1e6)),
        "--depth", str(args.depth), "--error_rate", str(args.error_rate),
        "--indel_error_rate", str(args.indel_error_rate),
        "--contigs", str(args.contigs),
        "--seed", str(args.seed)]
    if args.hp_profile:
        fixture_args.append("--hp_profile")
    bam = os.path.join(wd, "reads.bam")
    if not os.path.exists(bam):
        t0 = time.time()
        sim_main(fixture_args)
        print(f"fixture: {time.time()-t0:.1f}s")
    fasta = os.path.join(wd, "ref.fa")
    truth = os.path.join(wd, "truth.vcf.gz")

    out_dir = os.path.join(wd, "out")
    extra = ["--skip_phased_bam"] if args.skip_phased_bam else []
    if args.watchdog:
        extra += ["--watchdog", str(args.watchdog)]
    wall = run_cli(bam, fasta, out_dir, args.cpu, args.platform, extra)

    stages = {}
    counts = {}
    rates = {}
    mpath = os.path.join(out_dir, "metrics.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        stages = {k: round(v, 2) for k, v in m.get("timers_s", {}).items()}
        counts = m.get("counts", {})
        # stage-budget rates (VERDICT r2 item 9): candidate throughput
        # per stage; the indel stage is the phase_indel_dag wall when the
        # DAG ran (indel features+inference overlap phasing there)
        if counts.get("snp_candidates") and stages.get("snp_calling"):
            rates["snp_sites_per_s"] = round(
                counts["snp_candidates"] / stages["snp_calling"], 1)
        indel_wall = stages.get("indel_calling") or stages.get(
            "phase_indel_dag")
        if counts.get("indel_candidates") and indel_wall:
            rates["indel_sites_per_s"] = round(
                counts["indel_candidates"] / indel_wall, 1)
    calls = os.path.join(out_dir, "v.vcf.gz")
    rows = {"snp": evaluate(calls, truth, fasta, "snp"),
            "indel": evaluate(calls, truth, fasta, "indel")}
    if args.hp_profile:
        rows["indel_hp"] = evaluate(
            calls, truth, fasta, "indel", os.path.join(wd, "hp_regions.bed"))
        rows["indel_nonhp"] = evaluate(
            calls, truth, fasta, "indel",
            os.path.join(wd, "nonhp_regions.bed"))

    print(f"\n== bench_e2e {args.mb:g} Mb @{args.depth}x "
          f"({args.platform}, cpu={args.cpu}) ==")
    print(f"wall: {wall:.1f}s   stages: {stages}")
    print(f"counts: {counts}   rates: {rates}")
    for name, r in rows.items():
        print(f"{name:>12}: best F1 {r.get('f1', 0):.4f} "
              f"(P={r.get('precision', 0):.4f} R={r.get('recall', 0):.4f} "
              f"@QUAL>={r.get('threshold')})")
    print(json.dumps({
        "mb": args.mb, "contigs": args.contigs, "depth": args.depth,
        "platform": args.platform,
        "cpu": args.cpu, "seed": args.seed, "hp_profile": args.hp_profile,
        "wall_s": round(wall, 1), "stages": stages,
        "counts": counts, "rates": rates,
        "results": {k: {kk: r.get(kk) for kk in
                        ("f1", "precision", "recall", "threshold")}
                    for k, r in rows.items()},
    }))


if __name__ == "__main__":
    main()
