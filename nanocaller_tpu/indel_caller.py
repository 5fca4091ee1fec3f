"""Indel calling: batched CNN inference + allele decode + VCF output.

Decode parity with indelCaller.py:41-189: the 4-class genotype head
{hom-ref, hom-alt, het-ref, het-alt} (:14), the p(hom-ref) ≤ 0.95 gate
and QUAL = −10·log10(1e-6 + p0) (:95-97), 1/1 vs 1|2 allele merging
(:100-134), 0|1 / 1|0 with phase sets (:136-152), overlap suppression
via `prev` (:93), and the haploid sigmoid path (:157-182).

Post-processing replaces `rtg vcfdecompose | rtg vcffilter
--non-snps-only` (indelCaller.py:391) with an in-repo primitive
decomposition based on the same NW alignment used for allele prediction.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
import jax
import numpy as np

from .align.nw import nw_align
from .io.vcf import VcfRecord, standard_indel_header, write_sorted
from .models import HaploidIndelModel, IndelModel, load_model
from .pileup.indel_features import HaploidIndelBatch, IndelBatch, get_indel_candidates


@jax.jit
def _indel_forward(params, x):
    """x: flat (B, 15*128*2) rows, reshaped on device.

    The flat wire matters on TPU: a (B,15,128,2) transfer target takes
    the minor-dim-2 tiled layout of the compiled executable's parameter
    (padded 128-wide on device), making every subsequent device_put of
    that shape ~25-40x slower over the tunnel (measured 2.7 -> 71-140 ms
    for 3.9 MB once the executable exists). A flat minor dim keeps the
    h2d layout dense; the on-device reshape is free relative to it."""
    return IndelModel().apply(params, x.reshape(x.shape[0], 15, 128, 2))


@jax.jit
def _hap_indel_forward(params, x):
    """x: flat (B, 5*128*2) rows — see _indel_forward."""
    return HaploidIndelModel().apply(params, x.reshape(x.shape[0], 5, 128, 2))


@dataclass
class IndelCallerState:
    params: dict
    hap_params: dict
    # multi-chip serving mesh (all-dp), see SnpCallerState.mesh
    mesh: object = None

    @classmethod
    def create(cls, indel_model_name, mesh="auto"):
        from .runtime.sharding import inference_mesh, replicated

        params, _ = load_model("indel", indel_model_name)
        hap_params, _ = load_model("indel", "haploid")
        if mesh == "auto":
            mesh = inference_mesh()
        if mesh is not None:
            rep = replicated(mesh)
            params = jax.device_put(params, rep)
            hap_params = jax.device_put(hap_params, rep)
        return cls(params=params, hap_params=hap_params, mesh=mesh)


def _run_stacked(forward, params, x, batch_size, mesh=None):
    from .runtime.watchdog import beat

    beat()
    """Padded fixed-shape device batches over stacked input rows; with a
    mesh, each padded batch is split over the 'dp' axis (params stay
    replicated — device_put'd once by IndelCallerState.create)."""
    from .runtime.sharding import dp_scale, shard_batch

    batch_size = dp_scale(batch_size, mesh)
    x = np.ascontiguousarray(x).reshape(len(x), -1)  # flat rows (wire)
    B = len(x)
    outs = []
    for lo in range(0, B, batch_size):
        hi = min(lo + batch_size, B)
        pad = batch_size - (hi - lo)
        xs = x[lo:hi]
        if pad:
            xs = np.pad(xs, [(0, pad), (0, 0)])
        (xs,) = shard_batch((xs,), mesh)
        outs.append(np.asarray(forward(params, xs))[: hi - lo])
    return np.concatenate(outs) if outs else np.zeros((0, 4), np.float32)


def infer_indel_batch(state, batch, batch_size=256):
    """(B,4) genotype-class probabilities; input rows stacked hap0/hap1/all
    (indelCaller.py:83)."""
    x = np.concatenate([batch.x0, batch.x1, batch.x2], axis=1)  # (B,15,128,2)
    return _run_stacked(_indel_forward, state.params, x, batch_size,
                        state.mesh)


def infer_indel_many(state, batches, batch_size=256):
    """One device pass over several chunks' candidates → per-batch probs.

    Indel chunks are 100 kb and typically carry only a handful of
    candidates each; per-chunk device calls would pay one dispatch/
    transfer round trip per ~10 candidates (dominant on high-latency
    links). Returns [probs_i] aligned with `batches`.
    """
    lens = [len(b) for b in batches]
    if not lens:
        return []
    x = np.concatenate(
        [np.concatenate([b.x0, b.x1, b.x2], axis=1) for b in batches])
    out = _run_stacked(_indel_forward, state.params, x, batch_size,
                       state.mesh)
    splits = np.cumsum(lens)[:-1]
    return np.split(out, splits)


def infer_haploid_indel_batch(state, batch, batch_size=256):
    if len(batch) == 0:
        return np.zeros((0,), np.float32)
    return _run_stacked(_hap_indel_forward, state.hap_params, batch.x,
                        batch_size, state.mesh)[:, 0]


def infer_haploid_indel_many(state, batches, batch_size=256):
    """Haploid twin of infer_indel_many."""
    lens = [len(b) for b in batches]
    if not lens:
        return []
    x = np.concatenate([b.x for b in batches])
    out = _run_stacked(_hap_indel_forward, state.hap_params, x, batch_size,
                       state.mesh)[:, 0]
    return np.split(out, np.cumsum(lens)[:-1])


def decode_diploid_indels(batch: IndelBatch, probs):
    """→ VCF body lines (indelCaller.py:91-152)."""
    lines = []
    prev = 0
    preds = np.argmax(probs, axis=1)
    for j in range(len(batch)):
        pos = int(batch.pos[j])
        if pos <= prev:
            continue
        pj = probs[j]
        if pj[0] > 0.95:
            continue
        q = -10 * math.log10(1e-6 + pj[0])
        a0, a1, at = batch.alleles[j]
        ps = batch.phase[j]
        if preds[j] == 1 and at[0]:
            gq = -10 * math.log10(1 + 1e-6 - pj[1])
            lines.append("%s\t%d\t.\t%s\t%s\t%.2f\tPASS\t.\tGT:GQ\t1/1:%.2f\n"
                         % (batch.contig, pos, at[0], at[1], q, gq))
            prev = pos + max(len(at[0]), len(at[1]))
        else:
            if a0[0] and a1[0]:
                if a0[0] == a1[0] and a0[1] == a1[1]:
                    gq = -10 * math.log10(1 + 1e-6 - pj[1])
                    lines.append(
                        "%s\t%d\t.\t%s\t%s\t%.2f\tPASS\t.\tGT:GQ\t1/1:%.2f\n"
                        % (batch.contig, pos, a0[0], a0[1], q, gq))
                    prev = pos + max(len(a0[0]), len(a0[1]))
                else:
                    ref1, alt1 = a0
                    ref2, alt2 = a1
                    l = min(len(ref1), len(ref2))
                    if len(ref1) > len(ref2):
                        ref = ref1
                        alt2 = alt2 + ref1[l:]
                    else:
                        ref = ref2
                        alt1 = alt1 + ref2[l:]
                    gq = -10 * math.log10(1 + 1e-6 - pj[3])
                    if ps is not None:
                        lines.append(
                            "%s\t%d\t.\t%s\t%s,%s\t%.2f\tPASS\t.\tGT:GQ:PS\t1|2:%.2f:%d\n"
                            % (batch.contig, pos, ref, alt1, alt2, q, gq, ps))
                    else:
                        lines.append(
                            "%s\t%d\t.\t%s\t%s,%s\t%.2f\tPASS\t.\tGT:GQ\t1|2:%.2f\n"
                            % (batch.contig, pos, ref, alt1, alt2, q, gq))
                    prev = pos + max(len(ref), len(alt1), len(alt2))
            elif a0[0]:
                gq = -10 * math.log10(1 + 1e-6 - pj[2])
                if ps is not None:
                    lines.append(
                        "%s\t%d\t.\t%s\t%s\t%.2f\tPASS\t.\tGT:GQ:PS\t0|1:%.2f:%d\n"
                        % (batch.contig, pos, a0[0], a0[1], q, gq, ps))
                else:
                    lines.append(
                        "%s\t%d\t.\t%s\t%s\t%.2f\tPASS\t.\tGT:GQ\t0|1:%.2f\n"
                        % (batch.contig, pos, a0[0], a0[1], q, gq))
                prev = pos + max(len(a0[0]), len(a0[1]))
            elif a1[0]:
                gq = -10 * math.log10(1 + 1e-6 - pj[2])
                if ps is not None:
                    lines.append(
                        "%s\t%d\t.\t%s\t%s\t%.2f\tPASS\t.\tGT:GQ:PS\t1|0:%.2f:%d\n"
                        % (batch.contig, pos, a1[0], a1[1], q, gq, ps))
                else:
                    lines.append(
                        "%s\t%d\t.\t%s\t%s\t%.2f\tPASS\t.\tGT:GQ\t1|0:%.2f\n"
                        % (batch.contig, pos, a1[0], a1[1], q, gq))
                prev = pos + max(len(a1[0]), len(a1[1]))
    return lines


def decode_haploid_indels(batch: HaploidIndelBatch, probs):
    """indelCaller.py:157-182."""
    lines = []
    prev = 0
    for j in range(len(batch)):
        pos = int(batch.pos[j])
        at = batch.alleles[j]
        if pos > prev and probs[j] >= 0.5 and at[0]:
            q = -100 * math.log10(1e-6 + 1 - probs[j])
            lines.append("%s\t%d\t.\t%s\t%s\t%.2f\tPASS\t.\tGT:GQ\t1/1:%.2f\n"
                         % (batch.contig, pos, at[0], at[1], q, q))
            prev = pos + max(len(at[0]), len(at[1]))
    return lines


# -- decomposition (rtg vcfdecompose + vcffilter --non-snps-only) ------------

def primitives_of(ref, alt):
    """Split an (REF, ALT) pair into primitive variants via NW alignment.

    Returns [(offset0, p_ref, p_alt)] where offset0 is 0-based distance
    from the record position. Indels are left-anchored on the preceding
    reference base per VCF convention.

    rtg-default semantics (the reference pipes through `rtg vcfdecompose`
    with NO --break-mnps / --break-indels, indelCaller.py:391): the
    alignment is split ONLY at reference-match anchors, i.e. a primitive
    is a maximal run of non-'=' ops. Consequences the old per-op split
    got wrong: (a) adjacent mismatches stay grouped as ONE MNP — MNPs
    then SURVIVE `vcffilter --non-snps-only` (REF length > 1) and reach
    the final indel VCF; (b) a mismatch directly abutting an indel stays
    ONE complex record. Only isolated single-base mismatches decompose
    to SNPs (and are filtered downstream). rtg's exact alignment isn't
    published; this uses the same NW kernel as allele prediction, which
    agrees on every corpus case in tests/test_indel.py::TestRtgDecompose.
    """
    if ref == alt:
        return []
    cigar = nw_align(alt, ref)[1]
    out = []

    def emit(r0, ri, q0, qi):
        ref_seg = ref[r0:ri]
        alt_seg = alt[q0:qi]
        if ref_seg and alt_seg:  # MNP or complex (mixed) segment
            out.append((r0, ref_seg, alt_seg))
        elif alt_seg:  # pure insertion: anchor on the preceding base
            if r0 == 0:
                out.append((0, ref[0], alt_seg + ref[0]))
            else:
                out.append((r0 - 1, ref[r0 - 1], ref[r0 - 1] + alt_seg))
        elif ref_seg:  # pure deletion
            if r0 == 0:
                out.append((0, ref_seg + ref[ri], ref[ri]))
            else:
                out.append((r0 - 1, ref[r0 - 1 : ri], ref[r0 - 1]))

    qi = ri = 0
    r0 = q0 = 0
    in_seg = False
    for op, l in cigar:
        if op == 7:  # match anchor: close any open segment
            if in_seg:
                emit(r0, ri, q0, qi)
                in_seg = False
            qi += l
            ri += l
            continue
        if not in_seg:
            r0, q0 = ri, qi
            in_seg = True
        if op == 8:
            qi += l
            ri += l
        elif op == 1:
            qi += l
        elif op == 2:
            ri += l
    if in_seg:
        emit(r0, ri, q0, qi)
    return out


def decompose_record(rec: VcfRecord):
    """rtg vcfdecompose-like splitting of one record; keeps GT phase
    structure for 1|2 records (shared primitives → 1|1 or 1/1).

    Records the decomposition actually changed carry rtg's provenance
    INFO fields ORP (original record position) and ORL (original
    reference-allele length); untouched records pass through verbatim,
    as rtg leaves them."""
    alts = rec.alt.split(",")
    gt = rec.sample_field("GT") or "1/1"
    gq = rec.sample_field("GQ")
    ps = rec.sample_field("PS")
    prims = [primitives_of(rec.ref, a) for a in alts]

    if len(alts) == 1 and prims[0] == [(0, rec.ref, rec.alt)]:
        return [rec]  # already primitive: pass through untouched
    out = []
    orp_info = "ORP=%d;ORL=%d" % (rec.pos, len(rec.ref))
    if rec.info and rec.info != ".":
        orp_info = rec.info + ";" + orp_info

    def emit(off, pref, palt, gt_out):
        fmt = "GT:GQ" + (":PS" if ps is not None else "")
        sample = gt_out + (":%s" % gq if gq is not None else ":.")
        if ps is not None:
            sample += ":%s" % ps
        out.append(VcfRecord(rec.chrom, rec.pos + off, pref, palt, rec.qual,
                             rec.filter, info=orp_info, format_=fmt,
                             samples=[sample]))

    if len(alts) == 1:
        for off, pref, palt in prims[0]:
            emit(off, pref, palt, gt)
    else:
        keys0 = {(o, r, a) for o, r, a in prims[0]}
        keys1 = {(o, r, a) for o, r, a in prims[1]}
        for key in sorted(keys0 | keys1):
            off, pref, palt = key
            if key in keys0 and key in keys1:
                emit(off, pref, palt, "1|1")
            elif key in keys0:
                emit(off, pref, palt, "1|0")
            else:
                emit(off, pref, palt, "0|1")
    return out


def is_non_snp(rec: VcfRecord):
    """vcffilter --non-snps-only predicate."""
    if len(rec.ref) > 1:
        return True
    return any(len(a) > 1 for a in rec.alt.split(","))


def decompose_and_filter(records, contig_rank=None):
    """Sorted stream → decomposed, non-SNP-only sorted records."""
    out = []
    for rec in records:
        out.extend(r for r in decompose_record(rec) if is_non_snp(r))
    rank = contig_rank or {}
    out.sort(key=lambda r: (rank.get(r.chrom, 0), r.pos))
    return out


def call_indel_chunk(state, bam, fasta, chunk, cfg, exclude=None, rw=None):
    ploidy = chunk.get("ploidy", "diploid")
    batch = get_indel_candidates(
        bam, fasta, chunk, seq_type=cfg.sequencing, mincov=cfg.mincov,
        maxcov=cfg.maxcov, ins_t=cfg.ins_threshold, del_t=cfg.del_threshold,
        win_size=cfg.win_size, small_win_size=cfg.small_win_size,
        impute_indel_phase=cfg.impute_indel_phase, exclude=exclude,
        ploidy=ploidy, rw=rw,
        use_device_alignment=getattr(cfg, "device_alignment", False))
    if len(batch) == 0:
        return []
    if ploidy == "haploid":
        probs = infer_haploid_indel_batch(state, batch)
        return decode_haploid_indels(batch, probs)
    probs = infer_indel_batch(state, batch)
    return decode_diploid_indels(batch, probs)


def write_indel_vcf(cfg, contigs, chunk_lines, out_dir):
    """Merge + decompose + filter → {prefix}.indels.vcf.gz
    (indelCaller.py:369-391)."""
    import os

    header = standard_indel_header(contigs, cfg.sample)
    raw = []
    for lines in chunk_lines:
        raw.extend(VcfRecord.parse(l) for l in lines)
    rank = {c: i for i, c in enumerate(contigs)}
    raw.sort(key=lambda r: (rank.get(r.chrom, 1 << 30), r.pos))
    final = decompose_and_filter(raw, contig_rank=rank)
    path = os.path.join(out_dir, "%s.indels.vcf.gz" % cfg.prefix)
    return write_sorted(path, header, [iter(final)], contig_order=contigs)
