"""nanocaller_tpu: a TPU-native long-read variant calling framework.

A ground-up reimplementation of the capabilities of WGLab/NanoCaller
(haplotype-aware SNP calling + phased local-realignment indel calling for
ONT / PacBio CCS / PacBio CLR long reads) designed TPU-first:

- compute path: JAX / XLA / Pallas, batched fixed-shape tensors, pjit/shard_map
  over device meshes for scale-out;
- data path: an in-repo genomics I/O stack (BGZF/BAM/FASTA/VCF/tabix) with a
  C++ fast path, replacing the reference's pysam/samtools/bcftools externals;
- alignment path: batched affine-gap Needleman-Wunsch and star-MSA kernels,
  replacing parasail and MUSCLE subprocesses;
- phasing: in-repo read-based MEC phasing, replacing WhatsHap.

Reference behavior map: see SURVEY.md (reference = WGLab/NanoCaller v3.6.2).
"""

__version__ = "0.1.0"
