"""Synthetic diploid genome / long-read simulator.

Generates a reference FASTA plus a coordinate-sorted, indexed BAM with
planted SNPs and indels on two haplotypes, optional HP/PS haplotags, and
configurable substitution + sequencing-indel error rates — entirely with
the in-repo I/O stack. Used by the test suite and exposed as
tools/simulate.py so installs can be validated without real data (the
reference ships no test data or simulator, SURVEY.md §4).

Truth VCF emission: see `write_truth_vcf`.
"""

from __future__ import annotations

import numpy as np

from nanocaller_tpu.io.bam import AlignedRead, BamWriter
from nanocaller_tpu.io.fasta import write_fasta

BASES = "ACGT"


_BASE_BYTES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(rng, n):
    # same rng draw as the original generator-join, so sequences are
    # seed-identical; the byte-LUT path is ~100x faster at chr scale
    return bytes(_BASE_BYTES[rng.integers(0, 4, size=n)]).decode()


def make_diploid_readset(
    rng,
    ref_seq,
    snps=(),
    indels=(),
    depth=30,
    read_len=800,
    error_rate=0.0,
    indel_error_rate=0.0,
    hp_slip_rate=0.0,
    contig_start=0,
):
    """Simulate reads from two haplotypes of one contig.

    snps: list of (pos0, alt_base, genotype) with genotype in {"het1", "het2",
          "hom"} — het1 puts alt on haplotype 1 only, het2 on haplotype 2.
    indels: list of (pos0, kind, seq_or_len, genotype), kind in {"ins","del"}.
    Returns list of (qname, start0, seq, cigar, hap).
    """
    # Build the two haplotype sequences plus a ref-coordinate map for each.
    haps = []
    for h in (1, 2):
        edits = {}
        for pos, alt, gt in snps:
            if gt == "hom" or (gt == "het1" and h == 1) or (gt == "het2" and h == 2):
                edits[pos] = ("X", alt)
        for pos, kind, val, gt in indels:
            if gt == "hom" or (gt == "het1" and h == 1) or (gt == "het2" and h == 2):
                edits[pos] = (kind, val)
        haps.append(edits)

    # Pre-build per-haplotype mutated sequences by ref segment so read
    # construction is slicing + a short edit walk, not per-base Python.
    L = len(ref_seq)
    hap_data = []
    for edits in haps:
        positions = sorted(edits)
        # segments of untouched reference between edit anchors
        mutated = []
        seg_ref_start = []  # ref coordinate where each output segment starts
        cursor = 0
        events = []  # (ref_pos, kind, payload) for cigar construction
        for p in positions:
            kind, val = edits[p]
            if p < cursor:
                continue
            mutated.append(ref_seq[cursor:p])
            if kind == "X":
                mutated.append(val)
                events.append((p, "X", 1))
                cursor = p + 1
            elif kind == "ins":
                mutated.append(ref_seq[p] + val)
                events.append((p, "I", len(val)))
                cursor = p + 1
            else:  # del
                dlen = int(val)
                mutated.append(ref_seq[p])
                events.append((p, "D", dlen))
                cursor = p + 1 + dlen
        mutated.append(ref_seq[cursor:])
        hap_data.append((edits, events))

    reads = []
    n_reads = max(1, depth * L // read_len)
    starts = rng.integers(0, max(1, L - read_len // 2), size=n_reads)
    for i in range(n_reads):
        hap = 1 + (i % 2)
        start = int(starts[i])
        end = min(L, start + read_len)
        edits, events = hap_data[hap - 1]
        seq_parts = []
        cigar = []

        def push(op, n):
            if n <= 0:
                return
            if cigar and cigar[-1][0] == op:
                cigar[-1] = (op, cigar[-1][1] + n)
            else:
                cigar.append((op, n))

        p = start
        for ep, kind, val in events:
            if ep < p:
                continue
            if ep >= end:
                break
            seq_parts.append(ref_seq[p:ep])
            push("M", ep - p)
            if kind == "X":
                seq_parts.append(edits[ep][1])
                push("M", 1)
                p = ep + 1
            elif kind == "I":
                seq_parts.append(ref_seq[ep] + edits[ep][1])
                push("M", 1)
                push("I", val)
                p = ep + 1
            else:  # D
                seq_parts.append(ref_seq[ep])
                push("M", 1)
                push("D", min(val, end - ep - 1))
                p = ep + 1 + val
        if p < end:
            seq_parts.append(ref_seq[p:end])
            push("M", end - p)
        seq = "".join(seq_parts)
        if error_rate > 0:
            arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
            mask = rng.random(len(arr)) < error_rate
            subs = rng.integers(0, 4, size=int(mask.sum()))
            arr[mask] = np.frombuffer(b"ACGT", dtype=np.uint8)[subs]
            seq = arr.tobytes().decode()
        if indel_error_rate > 0:
            # sprinkle 1-2bp sequencing indels (ONT's dominant error mode):
            # split M runs at random points into M-I-M / M-D-M
            seq, cigar = _inject_indel_errors(rng, seq, cigar,
                                              indel_error_rate)
        if hp_slip_rate > 0:
            # length-dependent homopolymer slips — where ONT chemistry
            # actually fails (the reference's published indel F1 drops
            # from 0.82 outside homopolymers to 0.54 whole-genome,
            # docs/ONT_Case_Study.md:249-263)
            seq, cigar = _inject_hp_slips(rng, seq, cigar, hp_slip_rate)
        reads.append(("read_%04d" % i, contig_start + start, seq, cigar, hap))
    return reads


def _inject_indel_errors(rng, seq, cigar, rate):
    out_cigar = []
    out_seq = []
    qi = 0
    for op, l in cigar:
        if op != "M" or l < 8:
            out_cigar.append((op, l))
            if op in ("M", "I"):
                out_seq.append(seq[qi : qi + l])
                qi += l
            continue
        n_err = rng.binomial(l, rate)
        if n_err == 0:
            out_cigar.append((op, l))
            out_seq.append(seq[qi : qi + l])
            qi += l
            continue
        cuts = np.sort(rng.integers(2, l - 2, size=n_err))
        prev = 0
        for c in cuts:
            c = int(c)
            if c - prev < 2:
                continue
            out_cigar.append(("M", c - prev))
            out_seq.append(seq[qi + prev : qi + c])
            ln = int(rng.integers(1, 3))
            if rng.integers(2):  # insertion error
                out_cigar.append(("I", ln))
                out_seq.append(random_seq(rng, ln))
                prev = c
            else:  # deletion error: skip ln matched bases
                ln = min(ln, l - c - 2)
                if ln <= 0:
                    out_cigar.append(("M", 0))
                    prev = c
                    continue
                out_cigar.append(("D", ln))
                prev = c + ln
        if l - prev > 0:
            out_cigar.append(("M", l - prev))
            out_seq.append(seq[qi + prev : qi + l])
        qi += l
    # merge zero/adjacent runs
    merged = []
    for op, l in out_cigar:
        if l <= 0:
            continue
        if merged and merged[-1][0] == op:
            merged[-1] = (op, merged[-1][1] + l)
        else:
            merged.append((op, l))
    return "".join(out_seq), merged


def _inject_hp_slips(rng, seq, cigar, rate):
    """Length-dependent homopolymer slip errors inside M runs.

    For each homopolymer run of length r >= 4 within an aligned M
    segment, with probability min(0.5, rate*(r-3)) the polymerase
    "slips": one base of the run is inserted (M..M I1 M..) or deleted
    (M..M D1 M..) at the run's end, 50/50. Models the ONT error mode
    behind the reference's homopolymer indel weakness."""
    out_cigar = []
    out_seq = []
    qi = 0

    def push(op, ln):
        if ln <= 0:
            return
        if out_cigar and out_cigar[-1][0] == op:
            out_cigar[-1] = (op, out_cigar[-1][1] + ln)
        else:
            out_cigar.append((op, ln))

    for op, l in cigar:
        if op not in ("M", "I"):
            push(op, l)
            continue
        frag = seq[qi : qi + l]
        qi += l
        if op == "I" or l < 4:
            push(op, l)
            out_seq.append(frag)
            continue
        # homopolymer runs inside this M fragment
        arr = np.frombuffer(frag.encode(), dtype=np.uint8)
        bounds = np.concatenate(
            [[0], np.flatnonzero(arr[1:] != arr[:-1]) + 1, [l]])
        prev = 0
        for k in range(len(bounds) - 1):
            a, b = int(bounds[k]), int(bounds[k + 1])
            r = b - a
            if r < 4 or b >= l:  # keep slips strictly inside the segment
                continue
            if rng.random() >= min(0.5, rate * (r - 3)):
                continue
            if rng.integers(2):  # expansion: extra run base inserted
                push("M", b - prev)
                out_seq.append(frag[prev:b])
                push("I", 1)
                out_seq.append(frag[a])
                prev = b
            else:  # contraction: last run base dropped from the read
                push("M", b - 1 - prev)
                out_seq.append(frag[prev : b - 1])
                push("D", 1)
                prev = b
        push("M", l - prev)
        out_seq.append(frag[prev:])
    return "".join(out_seq), out_cigar


_CIGAR_OP_NUM = {"M": 0, "I": 1, "D": 2, "N": 3, "S": 4, "H": 5, "P": 6, "=": 7, "X": 8}


def write_bam(path, contig, contig_len, reads, tags_by_name=None, mapq=60,
              tag_haplotypes=False, phase_set=1):
    """reads: list of (qname, pos0, seq, cigar_list_of_(opchar,len), hap).

    tag_haplotypes=True writes HP/PS tags from each read's hap (simulating
    a whatshap-haplotagged BAM, the indel path's input)."""
    recs = []
    for qname, pos, seq, cigar, hap in reads:
        cig = [(_CIGAR_OP_NUM[op], l) for op, l in cigar]
        flag = 0
        tags = dict(tags_by_name.get(qname, {})) if tags_by_name else {}
        if tag_haplotypes:
            tags.setdefault("HP", hap)
            tags.setdefault("PS", phase_set)
        recs.append(
            AlignedRead(qname, flag, 0, pos, mapq, cig, seq,
                        np.full(len(seq), 30, np.uint8), tags)
        )
    recs.sort(key=lambda r: r.pos)
    with BamWriter(path, [contig], [contig_len]) as w:
        for r in recs:
            w.write(r)
    return path


def write_bam_multi(path, contig_reads, contig_lens, tag_haplotypes=False,
                    mapq=60):
    """contig_reads: {contig: reads list}; contig_lens: {contig: len}."""
    names = list(contig_lens)
    recs = []
    for ci, contig in enumerate(names):
        for qname, pos, seq, cigar, hap in contig_reads.get(contig, []):
            cig = [(_CIGAR_OP_NUM[op], l) for op, l in cigar]
            tags = {"HP": hap, "PS": 1} if tag_haplotypes else {}
            recs.append(AlignedRead("%s_%s" % (contig, qname), 0, ci, pos,
                                    mapq, cig, seq,
                                    np.full(len(seq), 30, np.uint8), tags))
    recs.sort(key=lambda r: (r.ref_id, r.pos))
    with BamWriter(path, names, [contig_lens[n] for n in names]) as w:
        for r in recs:
            w.write(r)
    return path


def write_truth_vcf(path, contig, ref_seq, snps=(), indels=(), sample="TRUTH"):
    """Emit the planted variants as a truth VCF (for tools/vcf_compare
    and the training CLIs)."""
    return write_truth_vcf_multi(path, {contig: (ref_seq, snps, indels)},
                                 sample=sample)


def write_truth_vcf_multi(path, per_contig, sample="TRUTH"):
    """Multi-contig truth VCF. per_contig: {name: (ref_seq, snps, indels)}
    in the desired header/record contig order."""
    from .io.vcf import VcfRecord, VcfWriter

    hdr = ["##fileformat=VCFv4.2"]
    hdr += ["##contig=<ID=%s>" % c for c in per_contig]
    hdr += ['##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t%s"
            % sample]
    with VcfWriter(path, hdr) as w:
        for contig, (ref_seq, snps, indels) in per_contig.items():
            recs = []
            for pos, alt, gt in snps:
                gt_str = "1/1" if gt == "hom" else "0/1"
                recs.append(VcfRecord(contig, pos + 1, ref_seq[pos], alt,
                                      "50", "PASS", format_="GT",
                                      samples=[gt_str]))
            for pos, kind, val, gt in indels:
                gt_str = "1/1" if gt == "hom" else "0/1"
                if kind == "ins":
                    ref, alt = ref_seq[pos], ref_seq[pos] + val
                else:
                    ref, alt = ref_seq[pos : pos + 1 + int(val)], ref_seq[pos]
                recs.append(VcfRecord(contig, pos + 1, ref, alt, "50",
                                      "PASS", format_="GT",
                                      samples=[gt_str]))
            recs.sort(key=lambda r: r.pos)
            for r in recs:
                w.write(r)
    return path


def make_fixture(tmpdir, seed=7, L=6000, depth=30, read_len=800,
                 snps=None, indels=None, contig="chr_t", error_rate=0.0,
                 tag_haplotypes=False):
    """Write a FASTA + BAM pair; returns (fasta_path, bam_path, ref_seq, snps)."""
    rng = np.random.default_rng(seed)
    ref_seq = random_seq(rng, L)
    if snps is None:
        snps = []
        for pos in range(500, L - 500, 997):
            ref_b = ref_seq[pos]
            alt = BASES[(BASES.index(ref_b) + 1) % 4]
            gt = ("het1", "het2", "hom")[pos % 3]
            snps.append((pos, alt, gt))
    indels = indels or []
    reads = make_diploid_readset(
        rng, ref_seq, snps=snps, indels=indels, depth=depth,
        read_len=read_len, error_rate=error_rate)
    fasta_path = str(tmpdir / "ref.fa")
    write_fasta(fasta_path, {contig: ref_seq})
    bam_path = str(tmpdir / "reads.bam")
    write_bam(bam_path, contig, L, reads, tag_haplotypes=tag_haplotypes)
    return fasta_path, bam_path, ref_seq, snps
