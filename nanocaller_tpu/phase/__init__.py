"""Read-based phasing: in-repo WhatsHap replacement (SURVEY.md §2.3 N6)."""

from .mec import PhaseResult, phase_contig, haplotag_reads
