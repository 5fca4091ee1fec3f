"""Feature-generation worker processes (no JAX imports here).

The reference parallelizes with mp.Process workers that each run feature
gen AND model inference on CPU (snpCaller.py:238-241). TPU-native split:
host-side feature generation fans out across worker processes while the
single device owner runs batched inference — workers must therefore
never touch JAX/TPU state (this module only imports io + pileup).
"""

from __future__ import annotations

_G = {}


def init_worker(bam_path, fasta_path, cfg_kwargs, exclude_path):
    """Pool initializer: open per-process file handles."""
    from ..io.bam import open_alignment
    from ..io.bed import BedIntervals
    from ..io.fasta import FastaFile

    _G["fasta"] = FastaFile(fasta_path)
    _G["bam"] = open_alignment(bam_path, fasta=_G["fasta"])
    _G["bam_path"] = bam_path
    _G["bam_cache"] = {bam_path: _G["bam"]}
    _G["cfg"] = cfg_kwargs
    _G["exclude"] = BedIntervals(exclude_path) if exclude_path else None


def _bam_for(path):
    from ..io.bam import open_alignment

    cache = _G["bam_cache"]
    if path not in cache:
        cache[path] = open_alignment(path, fasta=_G["fasta"])
    return cache[path]


def snp_features_worker(task):
    """(idx, chunk) → (idx, SnpChunkFeatures | SnpBatch).

    Default production representation is the deduplicated chunk transfer
    (SnpChunkFeatures); cfg['dedup_transfer']=False restores the dense
    per-candidate batches (oracle path)."""
    idx, chunk = task
    from ..pileup.snp_features import (get_snp_candidates,
                                       get_snp_chunk_features)

    cfg = _G["cfg"]
    builder = get_snp_chunk_features if cfg.get("dedup_transfer", True) \
        else get_snp_candidates
    batch = builder(
        _G["bam"], _G["fasta"], chunk,
        seq_type=cfg["sequencing"], mincov=cfg["mincov"],
        maxcov=cfg["maxcov"], min_allele_freq=cfg["min_allele_freq"],
        min_nbr_sites=cfg["min_nbr_sites"], threshold=cfg["threshold"],
        ploidy=chunk.get("ploidy", "diploid"), exclude=_G["exclude"])
    return idx, batch


def _tags_for(path):
    """Load (and cache per process) a contig's haplotag sidecar:
    qname → (hp, ps) lines written by the phasing stage."""
    cache = _G.setdefault("tags_cache", {})
    if path not in cache:
        tags = {}
        with open(path) as fh:
            for line in fh:
                qn, hp, ps = line.rstrip("\n").split("\t")
                tags[qn] = (int(hp), int(ps))
        cache[path] = tags
    return cache[path]


def indel_features_worker(task):
    """(idx, chunk) → (idx, IndelBatch|HaploidIndelBatch).

    Phase→indel handoff: chunk carries 'tags_path' (per-contig haplotag
    sidecar; reads decode from the ORIGINAL alignment and get HP/PS
    injected in memory — no phased-BAM round trip) or legacy 'sam_path'
    (a haplotagged BAM to decode from directly)."""
    idx, chunk = task
    from ..pileup.indel_features import get_indel_candidates

    cfg = _G["cfg"]
    bam = _bam_for(chunk.get("sam_path") or _G["bam_path"])
    tags = None
    tags_path = chunk.get("tags_path")
    if tags_path and not chunk.get("sam_path"):
        tags = _tags_for(tags_path)
    batch = get_indel_candidates(
        bam, _G["fasta"], chunk, seq_type=cfg["sequencing"],
        mincov=cfg["mincov"], maxcov=cfg["maxcov"], ins_t=cfg["ins_threshold"],
        del_t=cfg["del_threshold"], win_size=cfg["win_size"],
        small_win_size=cfg["small_win_size"],
        impute_indel_phase=cfg["impute_indel_phase"], exclude=_G["exclude"],
        ploidy=chunk.get("ploidy", "diploid"), tags=tags)
    return idx, batch


def cfg_kwargs_for_workers(cfg):
    return dict(
        sequencing=cfg.sequencing, mincov=cfg.mincov, maxcov=cfg.maxcov,
        min_allele_freq=cfg.min_allele_freq, min_nbr_sites=cfg.min_nbr_sites,
        threshold=cfg.threshold, ins_threshold=cfg.ins_threshold,
        del_threshold=cfg.del_threshold, win_size=cfg.win_size,
        small_win_size=cfg.small_win_size,
        impute_indel_phase=cfg.impute_indel_phase,
        dedup_transfer=getattr(cfg, "dedup_transfer", True))
