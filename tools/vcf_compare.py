"""VCF evaluation harness: precision/recall/F1 vs a truth set.

Fills the role rtg vcfeval plays in the reference's quality workflow
(docs/ONT_Case_Study.md:61-68): genotype-aware matching of calls against
a truth VCF (optionally restricted to a BED), swept over QUAL thresholds
with the best-F1 row reported — the layout of the case-study tables.

    python tools/vcf_compare.py --calls out.vcf.gz --truth truth.vcf.gz \
        [--bed conf.bed] [--type snp|indel|all]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nanocaller_tpu.io.bed import BedIntervals
from nanocaller_tpu.io.vcf import VcfReader


def norm_gt(gt):
    if gt is None:
        return None
    parts = gt.replace("|", "/").split("/")
    try:
        return tuple(sorted(int(p) for p in parts))
    except ValueError:
        return None


def normalize_allele(pos, ref, alt):
    """Trim shared suffix then prefix (keeping ≥1 base) and shift pos —
    so equivalent indel representations (different anchors) compare
    equal. Not full vcfeval haplotype-equivalence, but removes the
    common anchor-choice mismatches."""
    while len(ref) > 1 and len(alt) > 1 and ref[-1] == alt[-1]:
        ref, alt = ref[:-1], alt[:-1]
    while len(ref) > 1 and len(alt) > 1 and ref[0] == alt[0]:
        ref, alt = ref[1:], alt[1:]
        pos += 1
    return pos, ref, alt


def rec_key(rec):
    """Genotype-aware variant key with normalized alleles."""
    alleles = [rec.ref] + rec.alt.split(",")
    gt = norm_gt(rec.sample_field("GT")) or (1, 1)
    try:
        called = [alleles[i] for i in gt]
    except IndexError:
        called = [alleles[-1], alleles[-1]]
    normed = []
    base = None
    for a in called:
        p, r, x = normalize_allele(rec.pos, rec.ref, a)
        normed.append((p, r, x))
    normed.sort()
    return (rec.chrom, tuple(normed))


def is_snp_rec(rec):
    return len(rec.ref) == 1 and all(len(a) == 1 for a in rec.alt.split(","))


def load(path, bed=None, vtype="all"):
    out = {}
    for rec in VcfReader(path):
        if rec.alt in (".", ""):
            continue
        if bed is not None and not bed.overlaps(rec.chrom, rec.pos - 1):
            continue
        if vtype == "snp" and not is_snp_rec(rec):
            continue
        if vtype == "indel" and is_snp_rec(rec):
            continue
        out[rec_key(rec)] = rec.qual_value
    return out


def evaluate(calls, truth, thresholds=None):
    if thresholds is None:
        quals = sorted({q for q in calls.values()})
        thresholds = quals[:: max(1, len(quals) // 50)] or [0.0]
    rows = []
    truth_keys = set(truth)
    for t in thresholds:
        kept = {k for k, q in calls.items() if q >= t}
        tp = len(kept & truth_keys)
        fp = len(kept - truth_keys)
        fn = len(truth_keys - kept)
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        rows.append({"threshold": round(t, 3), "tp": tp, "fp": fp, "fn": fn,
                     "precision": round(prec, 4), "recall": round(rec, 4),
                     "f1": round(f1, 4)})
    best = max(rows, key=lambda r: r["f1"]) if rows else None
    return rows, best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", required=True)
    ap.add_argument("--truth", required=True)
    ap.add_argument("--bed")
    ap.add_argument("--type", default="all", choices=["snp", "indel", "all"])
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    bed = BedIntervals(args.bed) if args.bed else None
    calls = load(args.calls, bed, args.type)
    truth = load(args.truth, bed, args.type)
    rows, best = evaluate(calls, truth)
    if args.json:
        print(json.dumps({"rows": rows, "best": best}))
    else:
        print("threshold\ttp\tfp\tfn\tprecision\trecall\tf1")
        for r in rows:
            print("%(threshold)s\t%(tp)d\t%(fp)d\t%(fn)d\t%(precision)s\t"
                  "%(recall)s\t%(f1)s" % r)
        if best:
            print("# best F1: %(f1)s at QUAL>=%(threshold)s "
                  "(P=%(precision)s R=%(recall)s)" % best)
    return best


if __name__ == "__main__":
    main()
