"""Pileup engine: CIGAR-expanded event arrays + vectorized candidate scans.

Replaces pysam's per-column pileup iterator (reference:
generate_SNP_pileups.py:156-186, generate_indel_pileups.py:213-275) with
decode-once-per-chunk packed arrays and numpy/JAX segment ops.
"""

from .engine import ReadWindow, decode_reads
