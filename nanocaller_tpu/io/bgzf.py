"""BGZF (blocked gzip) reader/writer.

BGZF is the container format used by BAM, bgzipped VCF and tabix indices:
a series of gzip members, each carrying a BC extra subfield with the
compressed block size, so the file supports random access via 64-bit
virtual offsets ``(compressed_offset << 16) | within_block_offset``.

Replaces the reference's reliance on htslib/bgzip (SURVEY.md §2.3 N1/N5);
format per the SAM/BAM spec (hts-specs SAMv1.pdf §4.1).
"""

from __future__ import annotations

import os
import struct
import zlib

# Fixed 28-byte EOF marker block required at the end of a valid BGZF file.
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

_HEADER = struct.Struct("<4BI2BH")  # magic(2) CM FLG MTIME XFL OS XLEN
_MAX_BLOCK = 65536


class BgzfReader:
    """Random-access reader over a BGZF file.

    Supports sequential reads, `seek()` to virtual offsets and `tell()`
    returning virtual offsets, which is what index-driven BAM/tabix access
    needs.
    """

    def __init__(self, path_or_fileobj):
        if isinstance(path_or_fileobj, (str, os.PathLike)):
            self._fh = open(path_or_fileobj, "rb")
            self._owns = True
        else:
            self._fh = path_or_fileobj
            self._owns = False
        self._block_start = 0  # compressed offset of current block
        self._buffer = b""
        self._within = 0
        self._load_block(0)

    # -- block machinery ----------------------------------------------------

    def _read_block_at(self, coffset):
        """Read one BGZF block at compressed offset; returns (data, csize)."""
        self._fh.seek(coffset)
        header = self._fh.read(18)
        if len(header) == 0:
            return None, 0
        if len(header) < 18 or header[0] != 0x1F or header[1] != 0x8B:
            raise ValueError("not a BGZF block at offset %d" % coffset)
        xlen = struct.unpack("<H", header[10:12])[0]
        if xlen < 6:
            raise ValueError("corrupt BGZF XLEN %d at offset %d"
                             % (xlen, coffset))
        extra = header[12:] + self._fh.read(xlen - 6)
        bsize = None
        i = 0
        while i + 4 <= len(extra):
            si1, si2, slen = extra[i], extra[i + 1], struct.unpack("<H", extra[i + 2 : i + 4])[0]
            if si1 == 66 and si2 == 67 and slen == 2:
                if i + 6 > len(extra):
                    raise ValueError("truncated BGZF BC subfield at offset %d"
                                     % coffset)
                bsize = struct.unpack("<H", extra[i + 4 : i + 6])[0] + 1
                break
            i += 4 + slen
        if bsize is None:
            raise ValueError("gzip block without BGZF BC subfield (plain gzip?)")
        cdata = self._fh.read(bsize - xlen - 20)
        footer = self._fh.read(8)
        if len(footer) < 8:
            raise ValueError("truncated BGZF block at offset %d" % coffset)
        crc, isize = struct.unpack("<II", footer)
        try:
            data = zlib.decompress(cdata, wbits=-15)
        except zlib.error as e:
            raise ValueError(
                "corrupt BGZF deflate stream at offset %d: %s"
                % (coffset, e)) from e
        if len(data) != isize:
            raise ValueError("BGZF block ISIZE mismatch")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(
                "BGZF block CRC mismatch at offset %d (corrupt data)"
                % coffset)
        return data, bsize

    def _load_block(self, coffset):
        data, csize = self._read_block_at(coffset)
        self._block_start = coffset
        self._next_block = coffset + csize
        self._buffer = data if data is not None else b""
        self._within = 0
        return data is not None

    # -- public API ---------------------------------------------------------

    def read(self, size=-1):
        chunks = []
        remaining = size
        while remaining != 0:
            avail = len(self._buffer) - self._within
            if avail == 0:
                if not self._load_block(self._next_block) or not self._buffer:
                    if self._buffer == b"" and self._next_block is not None:
                        # empty block (EOF marker) — keep advancing
                        data, csize = self._read_block_at(self._next_block)
                        if data is None:
                            break
                        continue
                    break
                continue
            take = avail if remaining < 0 else min(avail, remaining)
            chunks.append(self._buffer[self._within : self._within + take])
            self._within += take
            if remaining > 0:
                remaining -= take
        return b"".join(chunks)

    def readline(self):
        parts = []
        while True:
            nl = self._buffer.find(b"\n", self._within)
            if nl != -1:
                parts.append(self._buffer[self._within : nl + 1])
                self._within = nl + 1
                return b"".join(parts)
            parts.append(self._buffer[self._within :])
            self._within = len(self._buffer)
            if not self._load_block(self._next_block) or not self._buffer:
                return b"".join(parts)

    def tell(self):
        """Virtual offset of current position."""
        # When positioned exactly at end of a block, report start of next.
        if self._within == len(self._buffer) and self._buffer:
            return self._next_block << 16
        return (self._block_start << 16) | self._within

    def seek(self, virtual_offset):
        coffset = virtual_offset >> 16
        within = virtual_offset & 0xFFFF
        if coffset != self._block_start or within > len(self._buffer):
            self._load_block(coffset)
        self._within = within
        return virtual_offset

    def close(self):
        if self._owns:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BgzfWriter:
    """Streaming BGZF writer producing spec-compliant blocks + EOF marker."""

    def __init__(self, path_or_fileobj, compresslevel=6):
        if isinstance(path_or_fileobj, (str, os.PathLike)):
            self._fh = open(path_or_fileobj, "wb")
            self._owns = True
        else:
            self._fh = path_or_fileobj
            self._owns = False
        self._level = compresslevel
        self._buffer = bytearray()
        self._closed = False
        # Keep payloads comfortably below 64 KiB so compressed size fits.
        self._flush_threshold = 65280

    def write(self, data):
        if isinstance(data, str):
            data = data.encode()
        self._buffer += data
        while len(self._buffer) >= self._flush_threshold:
            self._write_block(bytes(self._buffer[: self._flush_threshold]))
            del self._buffer[: self._flush_threshold]
        return len(data)

    def tell(self):
        """Virtual offset where the NEXT byte written will land."""
        return (self._fh.tell() << 16) | len(self._buffer)

    def flush(self):
        if self._buffer:
            self._write_block(bytes(self._buffer))
            self._buffer = bytearray()

    def _write_block(self, payload):
        co = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        cdata = co.compress(payload) + co.flush()
        bsize = len(cdata) + 19 + 6 + 1
        if bsize > _MAX_BLOCK:
            # Incompressible payload: split in half.
            mid = len(payload) // 2
            self._write_block(payload[:mid])
            self._write_block(payload[mid:])
            return
        block = (
            b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
            + struct.pack("<H", 6)
            + b"BC"
            + struct.pack("<H", 2)
            + struct.pack("<H", bsize - 1)
            + cdata
            + struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload))
        )
        self._fh.write(block)

    def close(self):
        if self._closed:
            return
        self.flush()
        self._fh.write(BGZF_EOF)
        if self._owns:
            self._fh.close()
        else:
            self._fh.flush()
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def is_bgzf(path):
    with open(path, "rb") as fh:
        head = fh.read(18)
    return (
        len(head) >= 18
        and head[0] == 0x1F
        and head[1] == 0x8B
        and head[3] & 4
        and head[12:14] == b"BC"
    )
