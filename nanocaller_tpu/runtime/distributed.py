"""Multi-host orchestration: jax.distributed + region sharding.

Scale-out model (SURVEY.md §2.4 / §5.8): model weights are replicated
(they are ~110k params); genomic chunks are statically assigned
round-robin by process index (each host's feature workers + chip handle
its share), per-host VCF shards are written independently, and process 0
k-way merges them — preserving the reference's shard-files-then-merge
contract (snpCaller.py:278-285) without any cross-host data-plane
traffic. Collectives are used only for small control data (call-count
reductions via psum on a global mesh).

Not exercisable on real multi-host hardware in this environment; the
logic is unit-tested via process-count parametrization and the driver's
virtual-device dry run covers the in-host mesh path.
"""

from __future__ import annotations

import os


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize wrapper (env-var fallback)."""
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("NANOCALLER_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("NANOCALLER_COORDINATOR", "localhost:12321"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("NANOCALLER_PROCESS_ID", "0")))
    return jax.process_index(), jax.process_count()


def shard_chunks(chunks, process_id, process_count):
    """Deterministic round-robin chunk assignment for this host."""
    return [c for i, c in enumerate(chunks) if i % process_count == process_id]


def host_shard_path(out_dir, prefix, stage, process_id):
    return os.path.join(out_dir, "%s.%s.host%03d.vcf.gz"
                        % (prefix, stage, process_id))


def merge_host_shards(paths, dst_path):
    """Process-0 k-way merge of per-host sorted shards."""
    from ..io.vcf import concat

    existing = [p for p in paths if os.path.exists(p)]
    return concat(existing, dst_path)


def merge_host_outputs(output_dir, prefix, num_shards):
    """Merge per-host suffix-tagged run outputs (written by runs with
    num_shards > 1) into the standard single-run file set. Returns the
    merged paths dict."""
    merged = {}
    for kind, suffix in (("snps", "snps.vcf.gz"),
                         ("unfiltered_snps", "unfiltered.snps.vcf.gz"),
                         ("phased_snps", "snps.phased.vcf.gz"),
                         ("indels", "indels.vcf.gz"),
                         ("final", "vcf.gz")):
        shard_paths = [
            os.path.join(output_dir, "%s.host%03d.%s" % (prefix, i, suffix))
            for i in range(num_shards)]
        existing = [p for p in shard_paths if os.path.exists(p)]
        if existing:
            dst = os.path.join(output_dir, "%s.%s" % (prefix, suffix))
            merged[kind] = merge_host_shards(existing, dst)
    return merged
