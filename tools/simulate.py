"""Generate a synthetic validation dataset: reference FASTA, aligned BAM
with planted SNPs/indels under configurable error rates, and the matching
truth VCF — everything needed to validate an install and exercise the
evaluation harness without real sequencing data.

    python tools/simulate.py --output sim/ --length 2000000 --depth 45 \
        --error_rate 0.04 --indel_error_rate 0.01
    nanocaller-tpu --bam sim/reads.bam --ref sim/ref.fa --mode all -o calls/
    python tools/vcf_compare.py --calls calls/variant_calls.vcf.gz \
        --truth sim/truth.vcf.gz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--contig", default="chrSim")
    ap.add_argument("--length", type=int, default=1_000_000)
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--read_len", type=int, default=12000)
    ap.add_argument("--error_rate", type=float, default=0.04)
    ap.add_argument("--indel_error_rate", type=float, default=0.0)
    ap.add_argument("--snp_spacing", type=int, default=700)
    ap.add_argument("--indel_spacing", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--haplotag", action="store_true",
                    help="write HP/PS tags (skip the phasing stage)")
    args = ap.parse_args(argv)

    from nanocaller_tpu.sim import (make_diploid_readset, random_seq,
                                    write_bam, write_truth_vcf)
    from nanocaller_tpu.io.fasta import write_fasta

    os.makedirs(args.output, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    L = args.length
    ref_seq = random_seq(rng, L)
    snps, indels = [], []
    indel_pos = set()
    for i, pos in enumerate(range(5000, L - 5000, args.indel_spacing)):
        gt = ("het1", "het2", "hom")[i % 3]
        if i % 2:
            indels.append((pos, "del", 3 + (i % 6), gt))
        else:
            indels.append((pos, "ins", "ACGTAC"[: 3 + (i % 4)], gt))
        indel_pos.update(range(pos - 12, pos + 12))
    for i, pos in enumerate(range(1500, L - 1500, args.snp_spacing)):
        if pos in indel_pos:
            # don't superimpose a SNP on an indel: the combined edit can
            # erase the SNP allele from the reads, planting an uncallable
            # truth record (observed at every lcm(spacings) position)
            continue
        rb = ref_seq[pos]
        snps.append((pos, "ACGT"[("ACGT".index(rb) + 1) % 4],
                     ("het1", "het2", "hom")[i % 3]))

    reads = make_diploid_readset(
        rng, ref_seq, snps=snps, indels=indels, depth=args.depth,
        read_len=args.read_len, error_rate=args.error_rate,
        indel_error_rate=args.indel_error_rate)
    fasta_p = os.path.join(args.output, "ref.fa")
    write_fasta(fasta_p, {args.contig: ref_seq})
    bam_p = os.path.join(args.output, "reads.bam")
    write_bam(bam_p, args.contig, L, reads, tag_haplotypes=args.haplotag)
    vcf_p = write_truth_vcf(os.path.join(args.output, "truth.vcf.gz"),
                            args.contig, ref_seq, snps, indels)
    print("wrote %s (%d reads), %s, %s (%d SNPs, %d indels)"
          % (bam_p, len(reads), fasta_p, vcf_p, len(snps), len(indels)))
    return fasta_p, bam_p, vcf_p


if __name__ == "__main__":
    main()
