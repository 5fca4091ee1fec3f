"""In-repo genomics I/O stack: BGZF, BAM, CRAM, FASTA(.fai), BED, VCF.

Replaces the reference's external native dependencies (pysam/htslib,
samtools, bcftools, bgzip, tabix — SURVEY.md §2.3 N1/N4/N5) with a
self-contained implementation: pure-Python bring-up path plus a C++
extraction library (``nanocaller_tpu/io/native``) for the hot decode loops.
"""

from .bgzf import BgzfReader, BgzfWriter
from .fasta import FastaFile
from .bam import BamReader, BamWriter, AlignedRead, open_alignment
from .cram import CramReader, CramWriter
from .bed import BedIntervals
