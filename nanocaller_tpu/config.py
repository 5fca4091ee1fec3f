"""Typed run configuration + presets.

Mirrors the reference CLI surface (NanoCaller:96-156) and preset
semantics (NanoCaller:66-77,162-171: preset values apply only to flags
the user did not explicitly set). The config serializes into the run
manifest for reproducibility (SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass


@dataclass
class Config:
    # required
    bam: str = None
    ref: str = None
    # mode / sequencing
    mode: str = "all"  # snps | indels | all
    sequencing: str = "ont"  # short_ont | ont | ul_ont | ul_ont_extreme | pacbio
    cpu: int = 1
    mincov: int = 4
    maxcov: int = 160
    haploid_genome: bool = False
    haploid_X: bool = False
    supplementary: bool = False  # force-disabled in reference (NanoCaller:160)
    # output
    output: str = None
    prefix: str = "variant_calls"
    sample: str = "SAMPLE"
    # regions
    regions: list = None
    bed: str = None
    wgs_contigs: str = None  # chr1-22XY | 1-22XY
    exclude_bed: str = None
    # snp
    snp_model: str = "ONT-HG002"
    min_allele_freq: float = 0.15
    min_nbr_sites: int = 1
    neighbor_threshold: str = "0.4,0.6"
    disable_coverage_normalization: bool = False
    # indel
    indel_model: str = "ONT-HG002"
    ins_threshold: float = 0.4
    del_threshold: float = 0.6
    win_size: int = 40
    small_win_size: int = 4
    impute_indel_phase: bool = False
    # phasing
    phase: bool = False
    phase_qual_score: float = 10.0
    enable_whatshap: bool = False
    # exact-wMEC trellis cell budget: the active-read cap of a block is
    # lowered until sites × 2^cap fits (phase/wmec._block_cap). The
    # default gives whatshap's cap 15 to blocks ≤ ~18k het sites and
    # cap 13 to a 70k-site whole-contig block (~2.4 GB parent storage,
    # ~4 s native DP); tools/phase_cap_study.py has the quality/time
    # curves behind this choice.
    phase_cell_budget: int = 600_000_000
    # framework extras (not in reference)
    # padded per-device batch for SNP inference. 4096 (round 5): the
    # tunnel's ~0.5 ms per-launch latency makes sites-per-launch the
    # streamed-kernel throughput lever (1024 → 1.3M sites/s resident,
    # 4096 → 7.6-8.8M, 8192 → 16.5-17.7M = the device ceiling); 4096
    # balances that against per-launch transients (the group kernel's
    # (batch × reads) masks) and padding waste on small cohorts.
    batch_size: int = 4096
    # deduplicated chunk transfer for the SNP device path (shared
    # site×read observations shipped once per chunk + on-device gather);
    # False restores dense per-candidate batches (oracle path)
    dedup_transfer: bool = True
    # group-level SNP device payload: one observation table per decode
    # group (2.5-6 Mb) instead of one per 500 kb member; False restores
    # per-member payloads (differential/debug path)
    snp_group_payload: bool = True
    # dispatched-but-unsynced inference units riding the device queue
    # (order-invariant; >1 measured no better under freeze-wave weather —
    # the stalls are whole-device, not per-transfer — so the round-4
    # depth-1 default stands; knob kept for clean-link experiments)
    snp_pipeline_depth: int = 1
    suppress_progress: bool = False
    verbose: bool = False
    skip_phased_bam: bool = False  # skip the per-contig phased BAM artifact
    # deflate level of the phased-BAM artifact (a regenerable
    # intermediate; level 1 writes ~37% faster at ~14% larger than the
    # samtools-default 6 and frees host cores for the concurrent indel
    # stage — BAM consumers are level-agnostic)
    phased_bam_compression: int = 1
    device_alignment: bool = True  # batch indel NW alignments on the TPU
    resume: bool = False  # reuse completed chunks from a prior run's manifest
    # >0: supervise the run and re-exec with --resume when no pipeline
    # progress is made for this many seconds (axon tunnel freeze
    # recovery; runtime/watchdog.py)
    watchdog: int = 0
    # multi-host region sharding: each process handles chunks where
    # chunk_index % num_shards == shard_index and writes suffix-tagged
    # outputs; merge with tools/merge_shards.py (or any shard can merge
    # once all host outputs exist)
    num_shards: int = 1
    shard_index: int = 0
    # true jax.distributed mode: with a coordinator + num_processes > 1,
    # run() initializes the global mesh, derives the shard from
    # jax.process_index(), psum-reduces counters and merges on process 0
    coordinator: str = ""
    num_processes: int = 1
    process_id: int = 0
    profile: bool = False  # capture a jax.profiler trace into output/trace

    @property
    def threshold(self):
        lo, hi = self.neighbor_threshold.split(",")
        return (float(lo), float(hi))

    def to_json(self):
        return json.dumps(dataclasses.asdict(self), indent=1, default=str)

    def dump(self, path):
        with open(path, "w") as fh:
            fh.write(self.to_json())


# preset values (NanoCaller:66-77)
PRESETS = {
    "ont": dict(sequencing="ont", snp_model="ONT-HG002", indel_model="ONT-HG002",
                neighbor_threshold="0.4,0.6", ins_threshold=0.4, del_threshold=0.6,
                enable_whatshap=False, impute_indel_phase=False),
    "short_ont": dict(sequencing="short_ont", snp_model="ONT-HG002",
                      indel_model="ONT-HG002", neighbor_threshold="0.3,0.7",
                      ins_threshold=0.4, del_threshold=0.6,
                      enable_whatshap=False, impute_indel_phase=False),
    "ul_ont": dict(sequencing="ul_ont", snp_model="ONT-HG002", indel_model="ONT-HG002",
                   neighbor_threshold="0.4,0.6", ins_threshold=0.4, del_threshold=0.6,
                   enable_whatshap=False, impute_indel_phase=False),
    "ul_ont_extreme": dict(sequencing="ul_ont_extreme", snp_model="ONT-HG002",
                           indel_model="ONT-HG002", neighbor_threshold="0.4,0.6",
                           ins_threshold=0.4, del_threshold=0.6,
                           enable_whatshap=False, impute_indel_phase=False),
    "ccs": dict(sequencing="pacbio", snp_model="CCS-HG002", indel_model="CCS-HG002",
                neighbor_threshold="0.3,0.7", ins_threshold=0.4, del_threshold=0.4,
                enable_whatshap=True, impute_indel_phase=True),
    "clr": dict(sequencing="pacbio", snp_model="CLR-HG002", indel_model="ONT-HG002",
                neighbor_threshold="0.3,0.6", ins_threshold=0.6, del_threshold=0.6,
                win_size=10, small_win_size=2, enable_whatshap=True,
                impute_indel_phase=False),
}

EXCLUDE_BED_PRESETS = ("hg38", "hg19", "mm10", "mm39")


def resolve_exclude_bed(value):
    """Map preset names to the bundled centromere/telomere BEDs
    (NanoCaller:21-22); copied into the repo's data dir."""
    if value in EXCLUDE_BED_PRESETS:
        here = os.path.dirname(os.path.abspath(__file__))
        path = os.path.join(here, "data", "bed_files", "%s_centro_telo.bed.gz" % value)
        if not os.path.exists(path):
            raise FileNotFoundError("bundled exclude bed missing: %s" % path)
        return path
    return value


def apply_preset(cfg: Config, preset: str, explicitly_set=()):
    """Apply preset values for fields the user did not explicitly set."""
    for key, val in PRESETS[preset].items():
        if key not in explicitly_set:
            setattr(cfg, key, val)
    return cfg
