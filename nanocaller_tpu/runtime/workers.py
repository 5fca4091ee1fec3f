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


def snp_features_group_worker(task):
    """(idx, [(orig_idx, chunk), ...]) → (idx, result).

    Coordinate-adjacent chunks decode their shared window ONCE
    (pileup/snp_features.scan_chunk_group). result is a GROUP-level
    SnpGroupFeatures payload by default (one observation table per
    decode group, members carrying orig indices), or the per-member
    [(orig_idx, feats), ...] list when group payloads are disabled
    (cfg['snp_group_payload']=False), the group is empty, or it exceeds
    the payload caps — same per-member outputs as snp_features_worker
    either way."""
    idx, group = task
    from ..pileup.snp_features import (SnpGroupFeatures,
                                       get_snp_group_features,
                                       get_snp_group_payload)

    cfg = _G["cfg"]
    kw = dict(
        seq_type=cfg["sequencing"], mincov=cfg["mincov"],
        maxcov=cfg["maxcov"], min_allele_freq=cfg["min_allele_freq"],
        min_nbr_sites=cfg["min_nbr_sites"], threshold=cfg["threshold"],
        exclude=_G["exclude"])
    if cfg.get("dedup_transfer", True) \
            and cfg.get("snp_group_payload", True):
        res = get_snp_group_payload(
            _G["bam"], _G["fasta"], [c for _, c in group], **kw)
        if isinstance(res, SnpGroupFeatures):
            res.members = [(oi, sec) for (oi, _), (_m, sec)
                           in zip(group, res.members)]
            return idx, res
        feats = res  # fallback: per-member feature list
    else:
        feats = get_snp_group_features(
            _G["bam"], _G["fasta"], [c for _, c in group],
            dedup=cfg.get("dedup_transfer", True), **kw)
    return idx, [(oi, f) for (oi, _), f in zip(group, feats)]


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


def indel_features_group_worker(task):
    """(idx, [(orig_idx, chunk), ...]) →
    (idx, [(orig_idx, batch), ...], seconds).

    Coordinate-adjacent indel chunks share one deferred decode + one
    pseudo-event emit (pileup.indel_features.get_indel_group_candidates);
    per-member output identical to indel_features_worker. `seconds` is
    the in-worker feature-gen wall — the DAG sums it into
    metrics.timers["indel.features_core"] so the per-stage budget
    (feature core-seconds vs device inference+decode) is observable."""
    import time as _time

    idx, group = task
    from ..pileup.indel_features import get_indel_group_candidates

    _t0 = _time.perf_counter()
    cfg = _G["cfg"]
    chunk0 = group[0][1]
    bam = _bam_for(chunk0.get("sam_path") or _G["bam_path"])
    tags = None
    tags_path = chunk0.get("tags_path")
    if tags_path and not chunk0.get("sam_path"):
        tags = _tags_for(tags_path)
    batches = get_indel_group_candidates(
        bam, _G["fasta"], [c for _, c in group], seq_type=cfg["sequencing"],
        mincov=cfg["mincov"], maxcov=cfg["maxcov"],
        ins_t=cfg["ins_threshold"], del_t=cfg["del_threshold"],
        win_size=cfg["win_size"], small_win_size=cfg["small_win_size"],
        impute_indel_phase=cfg["impute_indel_phase"], exclude=_G["exclude"],
        tags=tags)
    return (idx, [(oi, b) for (oi, _), b in zip(group, batches)],
            _time.perf_counter() - _t0)


def phase_contig_worker(task):
    """(idx, job) → phase one contig inside a feature worker (numpy-only;
    the per-contig phase→indel DAG fans these out so a contig's indel
    chunks can start the moment it phases, while other contigs are still
    phasing — the reference's dual-role worker unlock,
    indelCaller.py:253-262,320-336).

    job keys: chrom, start, end (1-based), snp_vcf, out_vcf, lowq_vcf,
    tags_path. Writes the phased VCF (+ low-qual passthrough when any)
    and the qname→(hp,ps) sidecar; returns (idx, summary dict)."""
    import time

    idx, job = task
    t0 = time.perf_counter()
    from ..io.vcf import VcfReader, VcfWriter
    from ..phase.mec import haplotag_reads, phase_contig, write_phased_vcf
    from ..pileup.engine import decode_reads_parallel
    from .watchdog import beat

    cfg = _G["cfg"]
    # milestone heartbeats: whole-contig decode + phase are legitimate
    # multi-minute host work at genome scale and must not look like a
    # device stall to a supervising --watchdog (workers inherit the
    # heartbeat env; they never touch the device)
    beat()
    reader = VcfReader(job["snp_vcf"])
    recs = list(reader.fetch(job["chrom"], job["start"], job["end"]))
    hiq = [r for r in recs if r.qual_value >= cfg["phase_qual_score"]]
    lowq = [r for r in recs if r.qual_value < cfg["phase_qual_score"]]
    het_sites = sorted(r.pos - 1 for r in hiq)
    beat()
    # threaded split decode: whole-contig phasing is one worker's task
    # in the per-contig DAG, so the spare cores are free for the decode
    rw = decode_reads_parallel(_G["bam"], job["chrom"],
                               max(0, job["start"] - 1), job["end"],
                               keep_seq=False, sites=het_sites)
    beat()
    result, phase_map = phase_contig(
        hiq, rw, distrust=cfg["enable_whatshap"],
        cell_budget=cfg.get("phase_cell_budget"),
        n_threads=job.get("phase_threads"))
    beat()
    tags = haplotag_reads(rw, result)

    class _Recs:
        header_lines = reader.header_lines

        def __iter__(self):
            return iter(hiq)

    files = []
    write_phased_vcf(_Recs(), job["out_vcf"], phase_map)
    files.append(job["out_vcf"])
    if lowq:
        with VcfWriter(job["lowq_vcf"], reader.header_lines) as w:
            for r in lowq:
                w.write(r)
        files.append(job["lowq_vcf"])
    with open(job["tags_path"], "w") as fh:
        for qn, t in tags.items():
            fh.write("%s\t%d\t%d\n" % (qn, t[0], t[1]))
    return idx, {"chrom": job["chrom"], "files": files,
                 "tags_path": job["tags_path"], "n_tags": len(tags),
                 "seconds": time.perf_counter() - t0}


def cfg_kwargs_for_workers(cfg):
    return dict(
        sequencing=cfg.sequencing, mincov=cfg.mincov, maxcov=cfg.maxcov,
        min_allele_freq=cfg.min_allele_freq, min_nbr_sites=cfg.min_nbr_sites,
        threshold=cfg.threshold, ins_threshold=cfg.ins_threshold,
        del_threshold=cfg.del_threshold, win_size=cfg.win_size,
        small_win_size=cfg.small_win_size,
        impute_indel_phase=cfg.impute_indel_phase,
        dedup_transfer=getattr(cfg, "dedup_transfer", True),
        snp_group_payload=getattr(cfg, "snp_group_payload", True),
        phase_qual_score=cfg.phase_qual_score,
        phase_cell_budget=getattr(cfg, "phase_cell_budget", None),
        enable_whatshap=cfg.enable_whatshap)
