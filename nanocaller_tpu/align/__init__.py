"""Alignment kernels: affine-gap NW with traceback + star-MSA.

In-repo replacements for parasail (SURVEY.md §2.3 N2) and the MUSCLE
subprocess-per-candidate MSA (N3). The numpy implementations here are
the correctness/bring-up path; the batched device path is the Pallas
anti-diagonal wavefront kernel in align/pallas_nw.py.
"""

from .nw import nw_align, nw_cigar
from .msa import star_msa, msa_tensor
