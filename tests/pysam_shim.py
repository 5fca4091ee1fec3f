"""Minimal pysam-compatible API over the in-repo I/O stack (TEST ONLY).

Purpose: differential parity testing. The reference implementation at
/root/reference imports pysam (absent in this environment); this shim
implements just enough of the pysam surface for
`nanocaller_src/generate_SNP_pileups.py` to run unmodified against our
BAM/FASTA stack, so its candidate positions and tensors can be diffed
against ours on identical inputs (tests/test_reference_parity.py).

Pileup semantics implemented to match pysam:
- columns are 0-based; truncate=True honors the requested span;
- entries ordered by read start (pileup entry order);
- deletion-spanning reads appear as '*' with add_indels=True;
- insertion/deletion start events are appended to the PRECEDING column's
  string as '+N<seq>' / '-N<seq>';
- get_num_aligned() counts non-deletion entries;
- min_base_quality is accepted (the reference passes 0, our fixtures
  carry uniform quality).
"""

from __future__ import annotations

import numpy as np

from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile as _Fasta
from nanocaller_tpu.pileup.engine import decode_reads

CODE_TO_BASE = "AGTC"


class _PileupRead:
    __slots__ = ("alignment", "query_position_or_next")

    def __init__(self, alignment, qpos):
        self.alignment = alignment
        self.query_position_or_next = qpos


class _Alignment:
    __slots__ = ("qname", "query_sequence", "flag")

    def __init__(self, qname, seq, flag):
        self.qname = qname
        self.query_sequence = seq
        self.flag = flag


class PileupColumn:
    def __init__(self, pos, entries):
        # entries: list of (rid_order_key, qname, kind, payload...)
        self.pos = pos  # 0-based
        self._entries = entries

    def get_query_names(self):
        return [e["qname"] for e in self._entries]

    def get_num_aligned(self):
        return sum(1 for e in self._entries if e["base"] != "*")

    def get_query_sequences(self, mark_matches=False, mark_ends=False,
                            add_indels=False):
        out = []
        for e in self._entries:
            s = e["base"]
            if add_indels:
                if e["ins"]:
                    s += "+%d%s" % (len(e["ins"]), e["ins"])
                elif e["del"]:
                    s += "-%d%s" % (e["del"], "N" * e["del"])
            out.append(s)
        return out

    @property
    def pileups(self):
        return [
            _PileupRead(_Alignment(e["qname"], e["seq"], e["flag"]), e["qpos"])
            for e in self._entries
        ]


class Samfile:
    def __init__(self, path, mode="rb", reference_filename=None):
        self._bam = BamReader(path)

    @property
    def references(self):
        return self._bam.references

    def is_valid_reference_name(self, name):
        return self._bam.is_valid_reference_name(name)

    def get_reference_length(self, name):
        return self._bam.get_reference_length(name)

    @property
    def format(self):
        return "BAM"

    def fetch(self, contig=None, start=0, end=None, multiple_iterators=False):
        for r in self._bam.fetch(contig, start, end):
            yield r

    def pileup(self, contig, start, end, min_base_quality=0, flag_filter=0,
               truncate=True, multiple_iterators=False):
        rw = decode_reads(self._bam, contig, start, end,
                          flag_exclude=flag_filter, keep_seq=True,
                          use_native=False)
        # per-column entries, built from event arrays; order by rid
        # (reads decoded in start-position order = pileup entry order)
        ins_at = {}
        for rid, p, ln in zip(rw.ins_rid, rw.ins_pos, rw.ins_len):
            ins_at[(int(rid), int(p))] = int(ln)
        del_at = {}
        for rid, p, ln in zip(rw.del_rid, rw.del_start, rw.del_len):
            del_at[(int(rid), int(p) - 1)] = int(ln)

        # aligned events grouped by column
        order = np.lexsort((rw.ev_rid, rw.ev_pos))
        ev_pos = rw.ev_pos[order]
        ev_rid = rw.ev_rid[order]
        ev_code = rw.ev_code[order]
        ev_qpos = rw.ev_qpos[order]
        in_span = (ev_pos >= start) & (ev_pos < end)
        ev_pos, ev_rid, ev_code, ev_qpos = (
            ev_pos[in_span], ev_rid[in_span], ev_code[in_span], ev_qpos[in_span])
        bounds = np.searchsorted(ev_pos, np.arange(start, end + 1))

        # deletion spans grouped by column
        span_cols = {}
        for rid, ds, dl in zip(rw.del_rid, rw.del_start, rw.del_len):
            for c in range(max(int(ds), start), min(int(ds + dl), end)):
                span_cols.setdefault(c, []).append(int(rid))

        # read seq access for ins payloads + pileups
        def ins_seq(rid, qpos_after, ln):
            seq = rw.seqs[rid]
            return seq[qpos_after + 1 : qpos_after + 1 + ln]

        for c in range(start, end):
            lo, hi = bounds[c - start], bounds[c - start + 1]
            entries = []
            for k in range(lo, hi):
                rid = int(ev_rid[k])
                code = int(ev_code[k])
                qpos = int(ev_qpos[k])
                base = CODE_TO_BASE[code] if code < 4 else "N"
                ins = ""
                nins = ins_at.get((rid, c), 0)
                if nins:
                    ins = ins_seq(rid, qpos, nins)
                entries.append({
                    "rid": rid, "qname": rw.qnames[rid], "base": base,
                    "ins": ins, "del": del_at.get((rid, c), 0),
                    "qpos": qpos, "seq": rw.seqs[rid], "flag": int(rw.flags[rid]),
                })
            for rid in span_cols.get(c, ()):
                # next aligned qpos for deletion-spanning reads
                sel = (rw.ev_rid == rid) & (rw.ev_pos > c)
                qn = int(rw.ev_qpos[sel][0]) if sel.any() else len(rw.seqs[rid])
                entries.append({
                    "rid": rid, "qname": rw.qnames[rid], "base": "*",
                    "ins": "", "del": 0, "qpos": qn, "seq": rw.seqs[rid],
                    "flag": int(rw.flags[rid]),
                })
            if not entries:
                continue
            entries.sort(key=lambda e: e["rid"])
            yield PileupColumn(c, entries)


AlignmentFile = Samfile


class FastaFile(_Fasta):
    pass


class _BedRow(list):
    pass


class TabixFile:
    """BED access: fetch(contig, parser=asBed()) → rows indexable [1],[2]."""

    def __init__(self, path):
        self._rows = {}
        import gzip

        from nanocaller_tpu.io.bgzf import BgzfReader, is_bgzf

        if is_bgzf(path):
            fh = BgzfReader(path)
            data = fh.read()
            fh.close()
        elif path.endswith(".gz"):
            data = gzip.open(path, "rb").read()
        else:
            data = open(path, "rb").read()
        for line in data.decode().splitlines():
            f = line.split("\t") if "\t" in line else line.split()
            if len(f) >= 3:
                self._rows.setdefault(f[0], []).append(_BedRow(f))

    def fetch(self, contig=None, parser=None):
        if contig not in self._rows:
            raise ValueError("could not create iterator for region")
        return iter(self._rows[contig])


class _AsBedMarker:
    pass


def asBed():
    return _AsBedMarker()


class _VcfSampleValues(dict):
    def get(self, key, default=None):
        return dict.get(self, key, default)


class _VcfSamples:
    def __init__(self, gt):
        self._gt = gt

    def items(self):
        return [("SAMPLE", _VcfSampleValues(GT=self._gt))]


class _VcfRec:
    def __init__(self, rec):
        self.pos = rec.pos
        self.ref = rec.ref
        self.contig = rec.chrom
        self.alleles = tuple([rec.ref] + rec.alt.split(","))
        gt_str = rec.sample_field("GT")
        gt = None
        if gt_str:
            parts = gt_str.replace("|", "/").split("/")
            vals = []
            for p in parts:
                vals.append(None if p == "." else int(p))
            gt = tuple(vals)
        self.samples = _VcfSamples(gt)


class VariantFile:
    def __init__(self, path):
        from nanocaller_tpu.io.vcf import VcfReader

        self._reader = VcfReader(path)

    def fetch(self, contig=None, start=None, end=None):
        # pysam fetch uses 0-based start, end-exclusive; the reference
        # calls fetch(chrom, start, end+1) with 1-based-ish bounds —
        # match pysam: include records with pos > start and pos <= end
        for rec in self._reader:
            if contig is not None and rec.chrom != contig:
                continue
            if start is not None and rec.pos <= start:
                continue
            if end is not None and rec.pos > end:
                continue
            yield _VcfRec(rec)
