"""Random-access FASTA reader using a .fai index (samtools faidx format).

Replaces ``pysam.FastaFile`` usage (reference: generate_SNP_pileups.py:135-137,
generate_indel_pileups.py:148,174). Builds the .fai in-process when missing.
"""

from __future__ import annotations

import os


class FastaFile:
    def __init__(self, path):
        self.path = path
        fai = path + ".fai"
        if not os.path.exists(fai):
            build_fai(path, fai)
        self._index = {}
        self._order = []
        with open(fai) as fh:
            for line in fh:
                name, length, offset, linebases, linewidth = line.split()[:5]
                self._index[name] = (
                    int(length),
                    int(offset),
                    int(linebases),
                    int(linewidth),
                )
                self._order.append(name)
        self._fh = open(path, "rb")

    @property
    def references(self):
        return list(self._order)

    def get_reference_length(self, name):
        return self._index[name][0]

    def __contains__(self, name):
        return name in self._index

    def fetch(self, name, start=0, end=None):
        """0-based half-open fetch, clamped to the contig; returns str."""
        length, offset, linebases, linewidth = self._index[name]
        start = max(0, start)
        end = length if end is None else min(end, length)
        if start >= end:
            return ""
        first_line, first_col = divmod(start, linebases)
        self._fh.seek(offset + first_line * linewidth + first_col)
        nbases = end - start
        # Read enough raw bytes to cover newlines, then strip them.
        nlines = (first_col + nbases + linebases - 1) // linebases
        raw = self._fh.read(nbases + nlines * (linewidth - linebases))
        seq = raw.replace(b"\n", b"").replace(b"\r", b"")[:nbases]
        return seq.decode()

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def build_fai(path, fai_path=None):
    """Generate a samtools-compatible .fai for an uncompressed FASTA."""
    fai_path = fai_path or path + ".fai"
    entries = []
    with open(path, "rb") as fh:
        name = None
        length = 0
        offset = 0
        linebases = 0
        linewidth = 0
        first_line = True
        while True:
            line_start = fh.tell()
            line = fh.readline()
            if not line:
                break
            if line.startswith(b">"):
                if name is not None:
                    entries.append((name, length, offset, linebases, linewidth))
                name = line[1:].split()[0].decode()
                length = 0
                offset = fh.tell()
                first_line = True
            else:
                stripped = line.rstrip(b"\r\n")
                if first_line and stripped:
                    linebases = len(stripped)
                    linewidth = len(line)
                    first_line = False
                length += len(stripped)
        if name is not None:
            entries.append((name, length, offset, linebases, linewidth))
    with open(fai_path, "w") as out:
        for e in entries:
            out.write("%s\t%d\t%d\t%d\t%d\n" % e)
    return fai_path


def write_fasta(path, contigs, linebases=60):
    """Write a FASTA file from {name: sequence}; returns the path."""
    with open(path, "w") as fh:
        for name, seq in contigs.items():
            fh.write(">%s\n" % name)
            for i in range(0, len(seq), linebases):
                fh.write(seq[i : i + linebases] + "\n")
    return path
