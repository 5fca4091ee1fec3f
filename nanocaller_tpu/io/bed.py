"""BED interval handling (exclude regions).

Replaces intervaltree + pysam.TabixFile (reference:
generate_SNP_pileups.py:113-126, SURVEY.md §2.3 N9) with sorted-array
binary search so exclusion can be applied as a vectorized mask over whole
position arrays instead of per-position tree queries.

Reads plain or bgzipped BED; the files involved (centromere/telomere
exclusions) are small, so no tabix index is needed.
"""

from __future__ import annotations

import numpy as np

from .bgzf import BgzfReader, is_bgzf


class BedIntervals:
    def __init__(self, path=None):
        self._by_contig = {}
        if path:
            self._load(path)

    def _load(self, path):
        if is_bgzf(path):
            fh = BgzfReader(path)
            data = fh.read()
            fh.close()
        else:
            import gzip

            opener = gzip.open if path.endswith(".gz") else open
            with opener(path, "rb") as f:
                data = f.read()
        raw = {}
        for line in data.split(b"\n"):
            if not line or line.startswith(b"#") or line.startswith(b"track"):
                continue
            parts = line.split(b"\t")
            if len(parts) < 3:
                parts = line.split()
            contig = parts[0].decode()
            raw.setdefault(contig, []).append((int(parts[1]), int(parts[2])))
        for contig, ivs in raw.items():
            ivs.sort()
            # merge overlapping/adjacent intervals so searchsorted is exact
            merged = []
            for s, e in ivs:
                if merged and s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            starts = np.array([m[0] for m in merged], dtype=np.int64)
            ends = np.array([m[1] for m in merged], dtype=np.int64)
            self._by_contig[contig] = (starts, ends)

    def add(self, contig, start, end):
        starts, ends = self._by_contig.get(contig, (np.array([], np.int64), np.array([], np.int64)))
        starts = np.append(starts, start)
        ends = np.append(ends, end)
        order = np.argsort(starts)
        self._by_contig[contig] = (starts[order], ends[order])

    def overlaps(self, contig, pos):
        """Point-overlap test matching IntervalTree.overlaps(pos):
        True iff some interval [s, e) with s <= pos < e exists."""
        entry = self._by_contig.get(contig)
        if entry is None:
            return False
        starts, ends = entry
        i = np.searchsorted(starts, pos, side="right") - 1
        return bool(i >= 0 and pos < ends[i])

    def mask(self, contig, positions):
        """Vectorized: boolean array, True where position IS excluded."""
        entry = self._by_contig.get(contig)
        positions = np.asarray(positions)
        if entry is None:
            return np.zeros(positions.shape, dtype=bool)
        starts, ends = entry
        idx = np.searchsorted(starts, positions, side="right") - 1
        valid = idx >= 0
        out = np.zeros(positions.shape, dtype=bool)
        out[valid] = positions[valid] < ends[idx[valid]]
        return out
