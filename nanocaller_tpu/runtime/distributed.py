"""Multi-host orchestration: jax.distributed + region sharding.

Scale-out model (SURVEY.md §2.4 / §5.8): model weights are replicated
(they are ~110k params); genomic chunks are statically assigned
round-robin by process index (each host's feature workers + chip handle
its share), per-host VCF shards are written independently, and process 0
k-way merges them — preserving the reference's shard-files-then-merge
contract (snpCaller.py:278-285) without any cross-host data-plane
traffic. Collectives are used only for small control data: per-stage
call counts are psum-reduced over a global 1-D device mesh, which
doubles as the end-of-run barrier before process 0 merges.

With `--coordinator host:port --num_processes N --process_id i` a single
command per host runs its region shard AND produces the merged final
VCFs on process 0 — no separate --merge_shards invocation. Tested with
real multi-process loopback collectives (Gloo CPU backend) in
tests/test_distributed.py; the same code path drives ICI/DCN
collectives on real multi-host TPU slices.
"""

from __future__ import annotations

import os

import numpy as np


_initialized = False


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize wrapper (env-var fallback, idempotent).

    Must run before anything touches the XLA backend — the CLI calls it
    ahead of the compilation-cache setup; run() calls it again (no-op)
    for programmatic users.
    """
    global _initialized
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("NANOCALLER_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return 0, 1
    if not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("NANOCALLER_COORDINATOR", "localhost:12321"),
            num_processes=num_processes,
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("NANOCALLER_PROCESS_ID", "0")))
        _initialized = True
        # Establish the cross-process collective contexts NOW, while all
        # processes are still aligned at startup. The first collective
        # pays a bounded connect handshake (Gloo's is 30s on CPU); if it
        # were first issued at the end-of-run reduction, a host that
        # finishes its region shard early would time out waiting for the
        # stragglers (observed: single-contig 2-process run where shard 1
        # was empty → instant DEADLINE_EXCEEDED against a 60s shard 0).
        try:
            allreduce_counts({"_init": 1})
        except Exception:  # noqa: BLE001 — warm-up is best-effort
            pass
    return jax.process_index(), jax.process_count()


def allreduce_counts(counts: dict) -> dict:
    """psum small per-host counters over a global 1-D device mesh.

    Each process contributes its values once (placed on its first local
    device; zeros elsewhere) so the psum over the mesh equals the sum
    over processes. Serves as a barrier: every process blocks until all
    have contributed. Single-process: returns counts unchanged.
    """
    import jax

    if jax.process_count() == 1:
        return dict(counts)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    keys = sorted(counts)
    width = max(1, len(keys))
    vals = [float(counts[k]) for k in keys] or [0.0]
    shards = []
    for d_i, dev in enumerate(jax.local_devices()):
        row = np.array([vals if d_i == 0 else [0.0] * width], np.float64)
        shards.append(jax.device_put(row, dev))
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    garr = jax.make_array_from_single_device_arrays(
        (jax.device_count(), width), NamedSharding(mesh, P("dp")), shards)
    f = jax.shard_map(lambda v: jax.lax.psum(v, "dp"), mesh=mesh,
                      in_specs=P("dp"), out_specs=P())
    out = np.asarray(f(garr).addressable_data(0))[0]
    return {k: int(v) if float(v).is_integer() else float(v)
            for k, v in zip(keys, out)}


def barrier(name="nanocaller", timeout_ms=24 * 3600 * 1000):
    """Block until every process reaches this point.

    Region shards finish at very different times (hours apart on real
    whole-genome runs), so this must tolerate arbitrary skew: it uses
    the coordination-service barrier (long explicit timeout) when
    available, falling back to a psum whose transport contexts were
    already established by the initialize()-time warm-up.
    """
    import jax

    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed as _dist

        client = _dist.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
            return
    except Exception:  # noqa: BLE001 — internal API; fall back below
        pass
    allreduce_counts({"_barrier": 1})


def shard_chunks(chunks, process_id, process_count):
    """Deterministic round-robin chunk assignment for this host."""
    return [c for i, c in enumerate(chunks) if i % process_count == process_id]


def shard_regions(regions, process_id, process_count, min_piece=200_000):
    """Region shard for this host: round-robin over (contig, start, end,
    ploidy) regions; when there are fewer regions than processes (e.g. a
    single-contig genome) the regions are first split into length-
    proportional sub-regions so every host gets work. Mid-contig splits
    make phase sets local to each shard (PS values stay valid — they
    anchor to each block's first het site)."""
    regions = [tuple(r) for r in regions]
    if 0 < len(regions) < process_count:
        total = sum(e - s + 1 for _, s, e, _ in regions)
        pieces = []
        for c, s, e, pl in regions:
            ln = e - s + 1
            k = max(1, round(process_count * ln / max(total, 1)))
            k = min(k, max(1, ln // min_piece))
            step = (ln + k - 1) // k
            for off in range(0, ln, step):
                pieces.append((c, s + off, min(e, s + off + step - 1), pl))
        regions = pieces
    return [r for i, r in enumerate(regions) if i % process_count == process_id]


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
