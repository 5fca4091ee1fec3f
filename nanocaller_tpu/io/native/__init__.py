"""Build + ctypes binding for the native BAM window decoder (libncio).

Compiled lazily on first use with g++ (no pybind11 in the image; plain
C API via ctypes). Falls back silently to the pure-Python decoder when
a toolchain is unavailable — `nanocaller_tpu.pileup.engine.decode_reads`
uses the native path automatically when importable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ncio.cpp")
_SO = os.path.join(_HERE, "libncio.so")

_lib = None
_build_error = None


def _build():
    native = ["g++", "-O3", "-march=native", "-funroll-loops", "-std=c++17",
              "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO + ".tmp", "-lz"]
    portable = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                "-pthread", _SRC, "-o", _SO + ".tmp", "-lz"]
    # probe libdeflate (2-3x faster BGZF inflate/deflate/crc32 than
    # zlib); fall back to zlib-only when header or lib is absent
    ld = ["-DNCIO_USE_LIBDEFLATE", "-ldeflate"]
    last = None
    for cmd in (native + ld, native, portable + ld, portable):
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            break
        except subprocess.CalledProcessError as e:
            last = e
    else:
        raise last
    os.replace(_SO + ".tmp", _SO)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.ncio_decode.restype = ctypes.c_void_p
        lib.ncio_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
        lib.ncio_sizes.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int64)]
        lib.ncio_decode_defer.restype = ctypes.c_void_p
        lib.ncio_decode_defer.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32]
        lib.ncio_emit_sites.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
        lib.ncio_emit_qpos.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.c_int32]
        lib.ncio_emit_qwin.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32)]
        lib.ncio_fill_events.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int32)]
        lib.ncio_haplotag.restype = ctypes.c_int32
        lib.ncio_haplotag.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.ncio_counts_width.restype = ctypes.c_int64
        lib.ncio_counts_width.argtypes = [ctypes.c_void_p]
        lib.ncio_counts_fill.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int32)]
        lib.ncio_free.argtypes = [ctypes.c_void_p]
        lib.ncio_nw_batch.restype = ctypes.c_void_p
        lib.ncio_nw_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32]
        lib.ncio_nw_sizes.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.ncio_nw_fill.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.ncio_nw_free.argtypes = [ctypes.c_void_p]
        lib.ncio_select_greedy.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8)]
        lib.ncio_select_connectivity.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.ncio_wmec.restype = ctypes.c_int32
        lib.ncio_wmec.argtypes = [
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
            ctypes.c_double, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_double)]
        lib.ncio_msa_project.restype = ctypes.c_void_p
        lib.ncio_msa_project.argtypes = [
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int32, ctypes.c_int32]
        lib.ncio_msa_sizes.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_int64)]
        lib.ncio_msa_fill.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_char_p]
        lib.ncio_msa_free.argtypes = [ctypes.c_void_p]
        lib.ncio_rans_uncompress.restype = ctypes.c_int32
        lib.ncio_rans_uncompress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.ncio_rans_compress.restype = ctypes.c_int32
        lib.ncio_rans_compress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.ncio_cram_begin.restype = ctypes.c_void_p
        lib.ncio_cram_begin.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int32]
        lib.ncio_window_counts_only.argtypes = [ctypes.c_void_p]
        lib.ncio_cram_feed.restype = ctypes.c_int32
        lib.ncio_cram_feed.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
        _lib = lib
    except Exception as e:  # noqa: BLE001 — any failure → python fallback
        _build_error = e
        _lib = None
    return _lib


def native_available():
    return get_lib() is not None


def nw_batch_cat_native(qcat, q_off, rcat, r_off, match, mismatch,
                        gap_open, gap_extend, packed=False):
    """Batched host NW via the C++ kernel over pre-concatenated int8
    code buffers (+ int64 offset arrays). Returns (cigars, scores);
    cigars are lists of (op, len) identical to align/nw.nw_align, or —
    with packed=True — read-only uint32 views of (len<<4|op) runs (the
    wire format the C++ MSA projection consumes directly, skipping the
    tuple materialization). None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(q_off) - 1
    if qcat.size == 0:
        qcat = np.zeros(1, np.int8)
    if rcat.size == 0:
        rcat = np.zeros(1, np.int8)

    def p(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    handle = lib.ncio_nw_batch(
        p(qcat, ctypes.c_int8), p(q_off, ctypes.c_int64),
        p(rcat, ctypes.c_int8), p(r_off, ctypes.c_int64),
        n, match, mismatch, gap_open, gap_extend)
    try:
        sizes = np.zeros(2, np.int64)
        lib.ncio_nw_sizes(ctypes.c_void_p(handle),
                          p(sizes, ctypes.c_int64))
        n_pairs, n_runs = int(sizes[0]), int(sizes[1])
        cigars_flat = np.zeros(max(1, n_runs), np.uint32)
        offsets = np.zeros(n_pairs + 1, np.int64)
        scores = np.zeros(max(1, n_pairs), np.int64)
        lib.ncio_nw_fill(ctypes.c_void_p(handle),
                         p(cigars_flat, ctypes.c_uint32),
                         p(offsets, ctypes.c_int64),
                         p(scores, ctypes.c_int64))
        if packed:
            cigars_flat.flags.writeable = False
            cigars = [cigars_flat[offsets[k]:offsets[k + 1]]
                      for k in range(n_pairs)]
        else:
            cigars = []
            for k in range(n_pairs):
                runs = cigars_flat[offsets[k]:offsets[k + 1]]
                cigars.append([(int(v & 0xF), int(v >> 4)) for v in runs])
        return cigars, scores[:n_pairs]
    finally:
        lib.ncio_nw_free(ctypes.c_void_p(handle))


def nw_batch_native(qcodes_list, rcodes_list, match, mismatch, gap_open,
                    gap_extend, packed=False):
    """Batched host NW via the C++ kernel; returns (cigars, scores) with
    cigars as lists of (op, len) identical to align/nw.nw_align (or
    packed uint32 run views — see nw_batch_cat_native). None if the
    native library is unavailable."""
    if get_lib() is None:
        return None
    n = len(qcodes_list)
    q_off = np.zeros(n + 1, np.int64)
    r_off = np.zeros(n + 1, np.int64)
    np.cumsum([len(a) for a in qcodes_list], out=q_off[1:])
    np.cumsum([len(a) for a in rcodes_list], out=r_off[1:])
    qcat = (np.concatenate(qcodes_list).astype(np.int8)
            if q_off[-1] else np.zeros(1, np.int8))
    rcat = (np.concatenate(rcodes_list).astype(np.int8)
            if r_off[-1] else np.zeros(1, np.int8))
    return nw_batch_cat_native(qcat, q_off, rcat, r_off, match, mismatch,
                               gap_open, gap_extend, packed=packed)


def _region_chunks(bam_reader, contig, start, end):
    """BAI virtual-offset chunk list for a region (flat uint64 pairs)."""
    if contig not in bam_reader._ref_to_id:
        return np.zeros(0, dtype=np.uint64)
    rid = bam_reader._ref_to_id[contig]
    if bam_reader._index is not None:
        chunk_list = bam_reader._index.chunks_for_region(rid, start, end)
        return np.array(chunk_list, dtype=np.uint64).reshape(-1)
    return np.array([bam_reader._data_start, 0], dtype=np.uint64)


def decode_window_native(bam_reader, contig, start, end, flag_exclude,
                         keep_seq=False, sites=None):
    """Native decode → dict of arrays (same content as ReadWindow fields).

    bam_reader: an open io.bam.BamReader (provides the BAI chunk list and
    contig ids). Returns None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    chunks = _region_chunks(bam_reader, contig, start, end)
    rid = bam_reader._ref_to_id.get(contig, -1)
    if sites is None:
        sites_arr = np.zeros(1, np.int64)
        n_sites = 0
    else:
        sites_arr = np.ascontiguousarray(sites, dtype=np.int64)
        n_sites = len(sites_arr)
        if n_sites == 0:
            sites_arr = np.zeros(1, np.int64)
    handle = lib.ncio_decode(
        bam_reader.path.encode(), rid, start, end,
        chunks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(chunks) // 2, flag_exclude, 1 if keep_seq else 0,
        sites_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_sites)
    try:
        return fill_window(lib, handle)
    finally:
        lib.ncio_free(ctypes.c_void_p(handle))


def fill_window(lib, handle):
    """Copy a native Window handle's arrays into a numpy dict (shared by
    the BAM and CRAM decode paths)."""
    sizes = np.zeros(7, dtype=np.int64)
    lib.ncio_sizes(handle, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    n_reads, n_ev, n_del, n_ins, qn_bytes, seq_bytes, err = sizes
    if err:
        return None
    out = {
        "flags": np.zeros(n_reads, np.int32),
        "strand": np.zeros(n_reads, np.int8),
        "read_start": np.zeros(n_reads, np.int64),
        "read_end": np.zeros(n_reads, np.int64),
        "hp": np.zeros(n_reads, np.int8),
        "ps": np.zeros(n_reads, np.int64),
        "qnames_raw": np.zeros(max(1, qn_bytes), np.uint8),
        "qname_off": np.zeros(n_reads + 1, np.int64),
        "seqs_raw": np.zeros(max(1, seq_bytes), np.uint8),
        "seq_off": np.zeros(n_reads + 1, np.int64),
        "ev_rid": np.zeros(n_ev, np.int32),
        "ev_pos": np.zeros(n_ev, np.int32),
        "ev_code": np.zeros(n_ev, np.int8),
        "ev_qpos": np.zeros(n_ev, np.int32),
        "del_rid": np.zeros(n_del, np.int32),
        "del_start": np.zeros(n_del, np.int32),
        "del_len": np.zeros(n_del, np.int32),
        "ins_rid": np.zeros(n_ins, np.int32),
        "ins_pos": np.zeros(n_ins, np.int32),
        "ins_len": np.zeros(n_ins, np.int32),
    }

    def p(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    lib.ncio_fill(
        ctypes.c_void_p(handle),
        p(out["flags"], ctypes.c_int32), p(out["strand"], ctypes.c_int8),
        p(out["read_start"], ctypes.c_int64), p(out["read_end"], ctypes.c_int64),
        p(out["hp"], ctypes.c_int8), p(out["ps"], ctypes.c_int64),
        p(out["qnames_raw"], ctypes.c_char), p(out["qname_off"], ctypes.c_int64),
        p(out["seqs_raw"], ctypes.c_char), p(out["seq_off"], ctypes.c_int64),
        p(out["ev_rid"], ctypes.c_int32), p(out["ev_pos"], ctypes.c_int32),
        p(out["ev_code"], ctypes.c_int8), p(out["ev_qpos"], ctypes.c_int32),
        p(out["del_rid"], ctypes.c_int32), p(out["del_start"], ctypes.c_int32),
        p(out["del_len"], ctypes.c_int32), p(out["ins_rid"], ctypes.c_int32),
        p(out["ins_pos"], ctypes.c_int32), p(out["ins_len"], ctypes.c_int32))
    cw = lib.ncio_counts_width(ctypes.c_void_p(handle))
    if cw > 0:
        counts = np.zeros((cw, 6), np.int32)
        lib.ncio_counts_fill(ctypes.c_void_p(handle),
                             p(counts, ctypes.c_int32))
        out["counts"] = counts
    return out


class DeferredDecode:
    """Two-phase native decode for the SNP path.

    Phase 1 (constructor, via decode_window_deferred): per-column counts +
    read metadata, record bytes stashed in the C++ handle — no per-base
    event arrays (22M events per 500 kb @45× would dominate decode time,
    RESULTS.md). Phase 2 (finish): emit events only at the
    candidate/neighbor site list and copy everything out.
    """

    def __init__(self, lib, handle, start, end):
        self._lib = lib
        self._handle = handle
        self.start, self.end = start, end
        cw = lib.ncio_counts_width(ctypes.c_void_p(handle))
        counts = np.zeros((max(0, cw), 6), np.int32)
        if cw > 0:
            lib.ncio_counts_fill(
                ctypes.c_void_p(handle),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        self.counts = counts

    def finish(self, sites):
        """Emit site-filtered events and return the raw window dict."""
        sites_arr = np.ascontiguousarray(sites, dtype=np.int64)
        n = len(sites_arr)
        if n == 0:
            sites_arr = np.zeros(1, np.int64)
        self._lib.ncio_emit_sites(
            ctypes.c_void_p(self._handle),
            sites_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n)
        try:
            return fill_window(self._lib, self._handle)
        finally:
            self._lib.ncio_free(ctypes.c_void_p(self._handle))
            self._handle = None

    def window_raw(self):
        """Phase-1 fill: read metadata/seqs/indel events, no M events
        (they're emitted later by finish/emit_qpos). The handle stays
        alive."""
        return fill_window(self._lib, self._handle)

    def emit_qpos(self, cols, keep=False):
        """Emit query-position-or-next pseudo-events at the sorted
        columns (indel path) and return (ev_rid, ev_pos, ev_code,
        ev_qpos). Frees the handle unless keep=True, which also retains
        the record store so emit_qwin can expand sequence windows later
        (caller must close())."""
        cols_arr = np.ascontiguousarray(cols, dtype=np.int64)
        n = len(cols_arr)
        if n == 0:
            cols_arr = np.zeros(1, np.int64)
        lib = self._lib
        lib.ncio_emit_qpos(
            ctypes.c_void_p(self._handle),
            cols_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            1 if keep else 0)
        try:
            sizes = np.zeros(7, dtype=np.int64)
            lib.ncio_sizes(ctypes.c_void_p(self._handle),
                           sizes.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_int64)))
            n_ev = int(sizes[1])
            ev_rid = np.zeros(n_ev, np.int32)
            ev_pos = np.zeros(n_ev, np.int32)
            ev_code = np.zeros(n_ev, np.int8)
            ev_qpos = np.zeros(n_ev, np.int32)
            lib.ncio_fill_events(
                ctypes.c_void_p(self._handle),
                ev_rid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ev_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ev_code.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                ev_qpos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            return ev_rid, ev_pos, ev_code, ev_qpos
        finally:
            if not keep:
                lib.ncio_free(ctypes.c_void_p(self._handle))
                self._handle = None

    def emit_qwin(self, rids, qstarts, win):
        """Expand query windows seq[max(0,q):q+win] from the stashed
        packed records (python-slice clamping); returns list[str].
        Valid only after emit_qpos(keep=True)."""
        rids = np.ascontiguousarray(rids, dtype=np.int32)
        qstarts = np.ascontiguousarray(qstarts, dtype=np.int32)
        n = len(rids)
        if n == 0:
            return []
        out = ctypes.create_string_buffer(n * win)
        out_len = np.zeros(n, np.int32)
        self._lib.ncio_emit_qwin(
            ctypes.c_void_p(self._handle),
            rids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            qstarts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, win, out,
            out_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        buf = out.raw
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(out_len, out=offs[1:])
        return [buf[offs[i]:offs[i + 1]].decode() for i in range(n)]

    def close(self):
        if self._handle is not None:
            self._lib.ncio_free(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):
        self.close()


def decode_window_deferred(bam_reader, contig, start, end, flag_exclude,
                           keep_seq=False, want_counts=True):
    """Start a two-phase deferred decode; None if native lib unavailable.

    want_counts=False (indel path) skips the per-base count accumulation
    entirely — phase 1 then costs only the record parse + indel events."""
    lib = get_lib()
    if lib is None:
        return None
    chunks = _region_chunks(bam_reader, contig, start, end)
    rid = bam_reader._ref_to_id.get(contig, -1)
    handle = lib.ncio_decode_defer(
        bam_reader.path.encode(), rid, start, end,
        chunks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(chunks) // 2, flag_exclude, 1 if keep_seq else 0,
        1 if want_counts else 0)
    sizes = np.zeros(7, dtype=np.int64)
    lib.ncio_sizes(ctypes.c_void_p(handle),
                   sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if sizes[6]:  # decode error → let caller fall back
        lib.ncio_free(ctypes.c_void_p(handle))
        return None
    return DeferredDecode(lib, handle, start, end)


def haplotag_native(bam_reader, out_path, contig, start, end, tags, level=6,
                    threads=0):
    """Write the haplotagged-BAM artifact in one C++ pass (stream region
    records, splice HP/PS tags, BGZF-write + BAI). tags: {qname: (hp, ps)}.
    threads: deflate pool size (0 = auto); callers overlapping this write
    with feature workers pass a budget so the cores aren't oversubscribed.
    Returns True on success; False → caller uses the Python writer."""
    import struct

    lib = get_lib()
    if lib is None or getattr(bam_reader, "format", None) != "BAM":
        return False
    if contig not in bam_reader._ref_to_id:
        return False
    rid = bam_reader._ref_to_id[contig]
    chunks = _region_chunks(bam_reader, contig, start, end)

    # raw uncompressed BAM header, same default text as io/bam.BamWriter
    header_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        "@SQ\tSN:%s\tLN:%d\n" % (n, l)
        for n, l in zip(bam_reader.references, bam_reader.lengths))
    text = header_text.encode()
    hdr = bytearray(b"BAM\x01")
    hdr += struct.pack("<i", len(text)) + text
    hdr += struct.pack("<i", len(bam_reader.references))
    for n, l in zip(bam_reader.references, bam_reader.lengths):
        nb = n.encode() + b"\x00"
        hdr += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l)
    hdr_arr = np.frombuffer(bytes(hdr), np.uint8)

    names = [qn.encode() for qn in tags]
    n_tags = len(names)
    off = np.zeros(n_tags + 1, np.int64)
    hp = np.zeros(max(1, n_tags), np.int8)
    ps = np.zeros(max(1, n_tags), np.int64)
    for i, (qn, t) in enumerate(tags.items()):
        off[i + 1] = off[i] + len(names[i])
        hp[i], ps[i] = int(t[0]), int(t[1])
    qcat = b"".join(names) or b"\x00"

    def p(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    rc = lib.ncio_haplotag(
        bam_reader.path.encode(), out_path.encode(), rid, start, end,
        p(chunks, ctypes.c_uint64), len(chunks) // 2,
        p(hdr_arr, ctypes.c_uint8), len(hdr_arr),
        len(bam_reader.references), qcat, p(off, ctypes.c_int64),
        p(hp, ctypes.c_int8), p(ps, ctypes.c_int64), n_tags, level,
        threads)
    return rc == 0


def cram_window_begin(start, end, n_sites):
    """Create a native Window handle for CRAM slice feeding; None when
    the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None, None
    return lib, lib.ncio_cram_begin(start, end, n_sites)


def cram_window_feed(lib, handle, spec, ext_blocks, core, refseg, ref_off0,
                     slice_ref_id, slice_start, n_records, record_counter,
                     want_rid, start, end, flag_exclude, keep_seq, sites):
    """Feed one slice into a CRAM window handle. ext_blocks: list of
    (content_id, bytes). Returns True on success; False → caller must
    free the handle and fall back to the Python decoder."""
    n_ext = len(ext_blocks)
    off = np.zeros(n_ext + 1, np.int64)
    cids = np.zeros(max(1, n_ext), np.int32)
    for i, (cid, data) in enumerate(ext_blocks):
        off[i + 1] = off[i] + len(data)
        cids[i] = cid
    cat = (b"".join(d for _, d in ext_blocks) or b"\x00")
    cat_arr = np.frombuffer(cat, np.uint8)
    core_arr = np.frombuffer(core or b"\x00", np.uint8)
    ref_arr = np.frombuffer(refseg.encode() if refseg else b"\x00", np.uint8)
    spec_arr = np.frombuffer(spec, np.uint8)
    if sites is None:
        sites_arr = np.zeros(1, np.int64)
        n_sites = 0
    else:
        sites_arr = np.ascontiguousarray(sites, dtype=np.int64)
        n_sites = len(sites_arr)
        if n_sites == 0:
            sites_arr = np.zeros(1, np.int64)

    def p(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    rc = lib.ncio_cram_feed(
        ctypes.c_void_p(handle), p(spec_arr, ctypes.c_uint8), len(spec_arr),
        p(cat_arr, ctypes.c_uint8), p(off, ctypes.c_int64),
        p(cids, ctypes.c_int32), n_ext, p(core_arr, ctypes.c_uint8),
        len(core or b""), p(ref_arr, ctypes.c_char), ref_off0,
        len(refseg or ""), slice_ref_id, slice_start, n_records,
        record_counter, want_rid, start, end, flag_exclude,
        1 if keep_seq else 0, p(sites_arr, ctypes.c_int64), n_sites)
    return rc == 0


def cram_window_finish(lib, handle):
    try:
        return fill_window(lib, handle)
    finally:
        lib.ncio_free(ctypes.c_void_p(handle))


def cram_window_free(lib, handle):
    lib.ncio_free(ctypes.c_void_p(handle))


def msa_project_native(read_codes_list, cigars, ref_codes, width=128):
    """Star-MSA column projection + indel tensor via the C++ kernel.

    read_codes_list: list of int8 arrays in the MSA alphabet (A0 G1 T2
    C3 other/gap 4); cigars: list of [(op, len)] global-alignment runs
    vs ref; ref_codes: int8 array. Returns (tensor (5,width,2) float32,
    consensus str) — bit-identical to align/msa.project_alignments +
    msa_tensor — or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(read_codes_list)
    read_off = np.zeros(n + 1, np.int64)
    cig_off = np.zeros(n + 1, np.int64)
    np.cumsum([len(a) for a in read_codes_list], out=read_off[1:])
    np.cumsum([len(c) for c in cigars], out=cig_off[1:])
    codes_cat = (np.concatenate(read_codes_list).astype(np.int8)
                 if n and read_off[-1] else np.zeros(1, np.int8))
    if n and cigars and isinstance(cigars[0], np.ndarray):
        # packed (len<<4|op) run arrays straight off the NW kernel
        runs = (np.concatenate(cigars).astype(np.uint32)
                if cig_off[-1] else np.zeros(1, np.uint32))
    else:
        runs = np.zeros(max(1, int(cig_off[-1])), np.uint32)
        p = 0
        for cg in cigars:
            for op, ln in cg:
                runs[p] = (ln << 4) | op
                p += 1
    ref_arr = np.ascontiguousarray(ref_codes, dtype=np.int8)
    if len(ref_arr) == 0:
        ref_arr = np.zeros(1, np.int8)

    def ptr(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    handle = lib.ncio_msa_project(
        ptr(codes_cat, ctypes.c_int8), ptr(read_off, ctypes.c_int64), n,
        ptr(runs, ctypes.c_uint32), ptr(cig_off, ctypes.c_int64),
        ptr(ref_arr, ctypes.c_int8), len(ref_codes), width)
    try:
        sizes = np.zeros(1, np.int64)
        lib.ncio_msa_sizes(ctypes.c_void_p(handle),
                           ptr(sizes, ctypes.c_int64))
        tensor = np.zeros((5, width, 2), np.float32)
        cns_buf = ctypes.create_string_buffer(max(1, int(sizes[0])))
        lib.ncio_msa_fill(ctypes.c_void_p(handle),
                          ptr(tensor.reshape(-1), ctypes.c_float), cns_buf)
        return tensor, cns_buf.raw[: int(sizes[0])].decode()
    finally:
        lib.ncio_msa_free(ctypes.c_void_p(handle))


def rans_uncompress_native(stream, raw_size):
    """C++ rANS4x8 decode; None if unavailable, raises on corrupt input."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(bytes(stream), dtype=np.uint8)
    out = np.zeros(max(1, raw_size), dtype=np.uint8)
    out_len = np.zeros(1, np.int64)
    rc = lib.ncio_rans_uncompress(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(out),
        out_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise ValueError("malformed rANS stream (native rc=%d)" % rc)
    return out[: int(out_len[0])].tobytes()


def rans_compress_native(data, order):
    """C++ rANS4x8 encode (byte-identical to io/rans.compress); None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, np.uint8)
    cap = len(data) + 300_000
    out = np.zeros(cap, dtype=np.uint8)
    out_len = np.zeros(1, np.int64)
    rc = lib.ncio_rans_compress(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        order, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        out_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        return None
    return out[: int(out_len[0])].tobytes()


def select_connectivity_native(first, last, cnt, multi, S, max_cov,
                               n_reads):
    """C++ connectivity-first selection loop
    (phase/wmec.select_reads_connectivity); returns taken bool[n_reads]
    or None when the library is unavailable. Bit-identical to the
    Python lazy-rescoring heap (strict total key order; pinned by
    tests/test_wmec_prod.py)."""
    lib = get_lib()
    if lib is None:
        return None
    first = np.ascontiguousarray(first, np.int64)
    last = np.ascontiguousarray(last, np.int64)
    cnt = np.ascontiguousarray(cnt, np.int64)
    multi = np.ascontiguousarray(multi, np.int64)
    taken = np.zeros(n_reads, np.uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ncio_select_connectivity(
        first.ctypes.data_as(i64p), last.ctypes.data_as(i64p),
        cnt.ctypes.data_as(i64p), multi.ctypes.data_as(i64p),
        len(multi), int(S), int(max_cov),
        taken.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return taken.astype(bool)


def select_greedy_native(order, first, last, S, max_cov, n_reads):
    """C++ greedy coverage-selection loop (phase/wmec.select_reads);
    returns taken bool[n_reads] or None when the library is unavailable.
    Bit-identical to the Python greedy loop (same visit order/predicate;
    pinned by tests/test_wmec_prod.py)."""
    lib = get_lib()
    if lib is None:
        return None
    order = np.ascontiguousarray(order, np.int64)
    first = np.ascontiguousarray(first, np.int64)
    last = np.ascontiguousarray(last, np.int64)
    taken = np.zeros(n_reads, np.uint8)
    lib.ncio_select_greedy(
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(order),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        last.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(S), int(max_cov),
        taken.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return taken.astype(bool)


def wmec_native(first, last, col_start, obs_read, obs_allele, g_in, gq,
                max_active, cell_budget):
    """Exact wMEC + joint genotype DP (phase/wmec.py core) in C++.

    Inputs are the renumbered multi-read form (see wmec.wmec_exact_gt):
    first/last int32[R] site spans, col_start int64[S+1] CSR of
    observations sorted by site, obs_read int32[K], obs_allele int8[K],
    g_in int8[S]. Returns (cost, a1, a2, part) or None when the native
    library is unavailable or the instance is infeasible (caller falls
    back to the Python DP)."""
    lib = get_lib()
    if lib is None:
        return None
    S = len(g_in)
    R = len(first)
    first = np.ascontiguousarray(first, np.int32)
    last = np.ascontiguousarray(last, np.int32)
    col_start = np.ascontiguousarray(col_start, np.int64)
    obs_read = np.ascontiguousarray(obs_read, np.int32)
    obs_allele = np.ascontiguousarray(obs_allele, np.int8)
    g_in = np.ascontiguousarray(g_in, np.int8)
    a1 = np.zeros(S, np.int8)
    a2 = np.zeros(S, np.int8)
    part = np.zeros(max(R, 1), np.int8)
    cost = ctypes.c_double(0.0)
    i8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    rc = lib.ncio_wmec(
        S, R, i32p(first), i32p(last), i64p(col_start), i32p(obs_read),
        i8p(obs_allele), i8p(g_in), float(gq), int(max_active),
        int(cell_budget), i8p(a1), i8p(a2), i8p(part),
        ctypes.byref(cost))
    if rc != 0:
        return None
    return float(cost.value), a1, a2, part[:R]
