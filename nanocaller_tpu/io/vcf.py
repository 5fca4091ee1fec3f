"""VCF read/write with bgzf compression + CSI (tabix) indexing.

In-repo replacement for the reference's bcftools/bgzip/tabix pipeline
(snpCaller.py:284-285, indelCaller.py:234-241,364,391,397 — SURVEY.md
§2.3 N5): per-shard records are produced position-sorted, merged k-way,
written as bgzipped VCF and CSI-indexed, with view/filter/concat
operations as plain functions.

CSI layout per hts-specs CSIv1 (min_shift=14, depth=5 — what
``tabix --csi`` emits).
"""

from __future__ import annotations

import heapq
import os
import struct

from .bgzf import BgzfReader, BgzfWriter, is_bgzf

CSI_MIN_SHIFT = 14
CSI_DEPTH = 5


def csi_reg2bin(beg, end, min_shift=CSI_MIN_SHIFT, depth=CSI_DEPTH):
    l = depth
    s = min_shift
    t = ((1 << depth * 3) - 1) // 7
    end -= 1
    while l > 0:
        if beg >> s == end >> s:
            return t + (beg >> s)
        l -= 1
        s += 3
        t -= 1 << l * 3
    return 0


class VcfRecord:
    __slots__ = ("chrom", "pos", "id", "ref", "alt", "qual", "filter", "info",
                 "format", "samples")

    def __init__(self, chrom, pos, ref, alt, qual, filter_, info=".",
                 format_=None, samples=None, id_="."):
        self.chrom = chrom
        self.pos = pos  # 1-based
        self.id = id_
        self.ref = ref
        self.alt = alt  # str "A" or "A,T"
        self.qual = qual  # preformatted str or float
        self.filter = filter_
        self.info = info
        self.format = format_
        self.samples = samples or []

    def line(self):
        qual = self.qual if isinstance(self.qual, str) else "%g" % self.qual
        fields = [self.chrom, str(self.pos), self.id, self.ref, self.alt,
                  qual, self.filter, self.info]
        if self.format:
            fields.append(self.format)
            fields.extend(self.samples)
        return "\t".join(fields) + "\n"

    @classmethod
    def parse(cls, line):
        f = line.rstrip("\n").split("\t")
        rec = cls(f[0], int(f[1]), f[3], f[4], f[5], f[6],
                  info=f[7] if len(f) > 7 else ".",
                  format_=f[8] if len(f) > 8 else None,
                  samples=f[9:] if len(f) > 9 else None, id_=f[2])
        return rec

    @property
    def qual_value(self):
        try:
            return float(self.qual)
        except (TypeError, ValueError):
            return float("-inf")

    def end_pos(self):
        return self.pos + len(self.ref) - 1

    def sample_field(self, key, sample=0):
        if not self.format:
            return None
        keys = self.format.split(":")
        vals = self.samples[sample].split(":")
        try:
            return vals[keys.index(key)]
        except (ValueError, IndexError):
            return None


class VcfWriter:
    """bgzipped (or plain) VCF writer with CSI index generation."""

    def __init__(self, path, header_lines, compress=None, write_index=None):
        if compress is None:
            compress = path.endswith(".gz")
        if write_index is None:
            write_index = compress
        self.path = path
        self.compress = compress
        self._fh = BgzfWriter(path) if compress else open(path, "w")
        self._write_index = write_index and compress
        self._contigs = []
        self._contig_ids = {}
        self._bins = []  # per contig: {bin: [(beg,end)]}
        self._loffset = []  # per contig: {bin: min voff}
        for line in header_lines:
            if not line.endswith("\n"):
                line += "\n"
            self._fh.write(line)
            if line.startswith("##contig=<ID="):
                name = line[len("##contig=<ID="):].split(",")[0].split(">")[0].strip()
                self._register_contig(name)
        if self.compress:
            self._fh.flush()

    def _register_contig(self, name):
        if name not in self._contig_ids:
            self._contig_ids[name] = len(self._contigs)
            self._contigs.append(name)
            self._bins.append({})
            self._loffset.append({})

    def write(self, rec: VcfRecord):
        line = rec.line() if isinstance(rec, VcfRecord) else rec
        if not self.compress:
            self._fh.write(line)
            return
        chrom = line.split("\t", 1)[0]
        self._register_contig(chrom)
        rid = self._contig_ids[chrom]
        f = line.split("\t", 5)
        beg = int(f[1]) - 1
        end = beg + max(1, len(f[3]))
        voff_beg = self._fh.tell()
        self._fh.write(line)
        voff_end = self._fh.tell()
        if self._write_index:
            b = csi_reg2bin(beg, end)
            self._bins[rid].setdefault(b, []).append((voff_beg, voff_end))
            cur = self._loffset[rid].get(b)
            if cur is None or voff_beg < cur:
                self._loffset[rid][b] = voff_beg

    def close(self):
        self._fh.close()
        if self._write_index:
            self._write_csi()

    def _write_csi(self):
        aux = struct.pack("<6i", 2, 1, 2, 0, ord("#"), 0)
        names = b"".join(n.encode() + b"\x00" for n in self._contigs)
        aux += struct.pack("<i", len(names)) + names
        with open(self.path + ".csi", "wb") as raw:
            fh = BgzfWriter(raw)
            fh.write(b"CSI\x01")
            fh.write(struct.pack("<3i", CSI_MIN_SHIFT, CSI_DEPTH, len(aux)))
            fh.write(aux)
            fh.write(struct.pack("<i", len(self._contigs)))
            for rid in range(len(self._contigs)):
                bins = self._bins[rid]
                fh.write(struct.pack("<i", len(bins)))
                for b in sorted(bins):
                    chunks = _merge_chunks(bins[b])
                    fh.write(struct.pack("<IQi", b, self._loffset[rid][b], len(chunks)))
                    for beg, end in chunks:
                        fh.write(struct.pack("<QQ", beg, end))
            fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _merge_chunks(chunks):
    chunks = sorted(chunks)
    out = []
    for c in chunks:
        if out and c[0] <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], c[1]))
        else:
            out.append(c)
    return out


def _csi_reg2bins(beg, end, min_shift=CSI_MIN_SHIFT, depth=CSI_DEPTH):
    bins = []
    l, t, s = 0, 0, min_shift + depth * 3
    end -= 1
    while l <= depth:
        b_lo = t + (beg >> s)
        b_hi = t + (end >> s)
        bins.extend(range(b_lo, b_hi + 1))
        s -= 3
        t += 1 << l * 3
        l += 1
    return bins


class CsiIndex:
    def __init__(self, path):
        fh = BgzfReader(path)
        data = fh.read()
        fh.close()
        if data[:4] != b"CSI\x01":
            raise ValueError("not CSI: %s" % path)
        self.min_shift, self.depth, l_aux = struct.unpack_from("<3i", data, 4)
        off = 16
        aux = data[off : off + l_aux]
        off += l_aux
        self.contigs = []
        if len(aux) >= 28:
            (l_nm,) = struct.unpack_from("<i", aux, 24)
            names = aux[28 : 28 + l_nm]
            self.contigs = [n.decode() for n in names.split(b"\x00") if n]
        (n_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        self.refs = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, off)
            off += 4
            bins = {}
            for _ in range(n_bin):
                b, loff, n_chunk = struct.unpack_from("<IQi", data, off)
                off += 16
                chunks = []
                for _ in range(n_chunk):
                    cb, ce = struct.unpack_from("<QQ", data, off)
                    off += 16
                    chunks.append((cb, ce))
                bins[b] = (loff, chunks)
            self.refs.append(bins)

    def chunks_for_region(self, rid, beg, end):
        if rid >= len(self.refs):
            return []
        bins = self.refs[rid]
        out = []
        for b in _csi_reg2bins(beg, end, self.min_shift, self.depth):
            if b in bins:
                out.extend(bins[b][1])
        return _merge_chunks(out)


class VcfReader:
    def __init__(self, path):
        self.path = path
        self._compressed = is_bgzf(path)
        self.header_lines = []
        self.sample = None
        fh = self._open()
        while True:
            tell = fh.tell()
            line = fh.readline()
            if not line:
                break
            text = line.decode() if isinstance(line, bytes) else line
            if text.startswith("#"):
                self.header_lines.append(text.rstrip("\n"))
                if text.startswith("#CHROM"):
                    cols = text.rstrip("\n").split("\t")
                    self.sample = cols[9] if len(cols) > 9 else None
                    self._data_start = fh.tell()
                    break
            else:
                self._data_start = tell
                break
        self._close(fh)
        self._index = None
        if self._compressed and os.path.exists(path + ".csi"):
            self._index = CsiIndex(path + ".csi")

    def _open(self):
        if self._compressed:
            return BgzfReader(self.path)
        import gzip

        if self.path.endswith(".gz"):
            return gzip.open(self.path, "rt")
        return open(self.path, "r")

    def _close(self, fh):
        fh.close()

    @property
    def contigs(self):
        out = []
        for h in self.header_lines:
            if h.startswith("##contig=<ID="):
                out.append(h[len("##contig=<ID="):].split(",")[0].split(">")[0])
        return out

    def __iter__(self):
        fh = self._open()
        try:
            fh.seek(self._data_start)
        except Exception:
            pass
        for line in iter(fh.readline, b"" if self._compressed else ""):
            text = line.decode() if isinstance(line, bytes) else line
            if not text.strip() or text.startswith("#"):
                continue
            yield VcfRecord.parse(text)
        self._close(fh)

    def fetch(self, contig, start=None, end=None):
        """start/end are 1-based inclusive (like bcftools -r)."""
        beg0 = 0 if start is None else start - 1
        end0 = 1 << 40 if end is None else end
        if self._index is not None and contig in self._index.contigs:
            rid = self._index.contigs.index(contig)
            fh = self._open()
            for cbeg, cend in self._index.chunks_for_region(rid, beg0, end0):
                fh.seek(cbeg)
                while fh.tell() < cend:
                    line = fh.readline()
                    if not line:
                        break
                    rec = VcfRecord.parse(line.decode())
                    if rec.chrom != contig or rec.pos > end0:
                        continue
                    if rec.pos - 1 >= beg0 or rec.end_pos() > beg0:
                        if rec.pos <= end0:
                            yield rec
            self._close(fh)
        else:
            for rec in self:
                if rec.chrom == contig and rec.pos <= end0 and rec.end_pos() >= beg0 + 1:
                    yield rec


# -- bcftools-like operations ------------------------------------------------

def standard_snp_header(contigs, sample):
    """The SNP VCF header, byte-matched to snpCaller.py:258-276."""
    h = [
        "##fileformat=VCFv4.2",
        '##FILTER=<ID=PASS,Description="All filters passed">',
        '##FILTER=<ID=LOW,Description="All alleles have probability less than 50%.">',
        '##FILTER=<ID=REF,Description="Homozygous Reference. Only reference allele has greater than 50% probability. All alternative alleles having probability less than 50%.">',
    ]
    h += ["##contig=<ID=%s>" % c for c in contigs]
    h += [
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">',
        '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allelic depths for the ref and alt alleles in the order listed">',
        '##FORMAT=<ID=ADF,Number=R,Type=Integer,Description="Allelic depths on forward strand for the ref and alt alleles in the order listed">',
        '##FORMAT=<ID=ADR,Number=R,Type=Integer,Description="Allelic depths on reverse strand for the ref and alt alleles in the order listed">',
        '##FORMAT=<ID=VF,Number=A,Type=Float,Description="Alternative allele frequency in the order listed">',
        '##INFO=<ID=PR,Number=4,Type=Float,Description="Probability of presence of alleles A, C, G and T, in the given order. Probability of each base is out of 1, independent of each other.">',
        '##INFO=<ID=FQ,Number=1,Type=Float,Description="Maximum frequency of non-reference base.">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t%s" % sample,
    ]
    return h


def standard_indel_header(contigs, sample):
    """Indel VCF header (indelCaller.py:372-383)."""
    h = [
        "##fileformat=VCFv4.2",
        '##FILTER=<ID=PASS,Description="All filters passed">',
    ]
    h += ["##contig=<ID=%s>" % c for c in contigs]
    h += [
        # provenance INFO written by decompose_record (rtg vcfdecompose's
        # fields for records it split, indelCaller.py:391)
        '##INFO=<ID=ORP,Number=1,Type=Integer,Description="Original variant position">',
        '##INFO=<ID=ORL,Number=1,Type=Integer,Description="Original reference length">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=GQ,Number=1,Type=Float,Description="Genotype Probability">',
        '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="Phase set identifier">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t%s" % sample,
    ]
    return h


def write_sorted(path, header_lines, record_streams, contig_order=None,
                 predicate=None):
    """k-way merge pre-sorted record streams into an indexed vcf.gz.

    Each stream must be sorted by (contig, pos). contig_order fixes the
    global contig rank (defaults to order of ##contig header lines).
    """
    if contig_order is None:
        contig_order = [
            h[len("##contig=<ID="):].split(",")[0].split(">")[0]
            for h in header_lines
            if h.startswith("##contig=<ID=")
        ]
    rank = {c: i for i, c in enumerate(contig_order)}

    def keyed(stream, sid):
        # sid breaks ties when two streams carry a record at the same
        # position (e.g. sub-contig host shards with halo overlap) —
        # VcfRecord itself is not orderable and must never be compared
        for i, rec in enumerate(stream):
            yield (rank.get(rec.chrom, 1 << 30), rec.pos, sid, i), rec

    with VcfWriter(path, header_lines) as w:
        for _, rec in heapq.merge(
                *[keyed(s, sid) for sid, s in enumerate(record_streams)]):
            if predicate is None or predicate(rec):
                w.write(rec)
    return path


def view_filter(src_path, dst_path, predicate):
    """bcftools view-like copy with a record predicate."""
    r = VcfReader(src_path)
    with VcfWriter(dst_path, r.header_lines) as w:
        for rec in r:
            if predicate(rec):
                w.write(rec)
    return dst_path


def concat(paths, dst_path, header_lines=None):
    """bcftools concat -a: merge by position across files."""
    readers = [VcfReader(p) for p in paths]
    if header_lines is None:
        header_lines = readers[0].header_lines
        seen = set(header_lines)
        for r in readers[1:]:
            for h in r.header_lines:
                if h not in seen and h.startswith("##") and not h.startswith("##fileformat"):
                    idx = len(header_lines) - 1
                    header_lines.insert(idx, h)
                    seen.add(h)
    contigs = []
    for r in readers:
        for c in r.contigs:
            if c not in contigs:
                contigs.append(c)
    return write_sorted(dst_path, header_lines, [iter(r) for r in readers],
                        contig_order=contigs)
