"""Chunk scheduler: parallel host feature-gen feeding the device owner.

Replaces the reference's worker-pool runtime (mp.Manager queues +
mp.Process, snpCaller.py:213-249, indelCaller.py:290-356) with a
producer/consumer split suited to an accelerator: N feature-gen
processes (io + numpy only) stream candidate batches to the main
process, which owns the TPU and runs batched inference as results
arrive (dynamic load balancing via imap_unordered). Results are
re-ordered by chunk index so VCF shards stay deterministic.

Also provides the chunk-level run manifest for idempotent restart —
the reference has no job-level resume (SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os


def feature_stream(chunks, worker_fn, init_args, n_workers, ordered=False):
    """Yield (idx, batch) for every chunk.

    n_workers <= 1 runs inline (no processes). Uses the 'spawn' start
    method so worker processes never inherit TPU/JAX state.
    """
    from . import workers

    tasks = list(enumerate(chunks))
    if n_workers <= 1 or len(tasks) <= 1:
        workers.init_worker(*init_args)
        for task in tasks:
            yield worker_fn(task)
        workers._G.clear()
        return
    ctx = mp.get_context("spawn")
    with ctx.Pool(processes=min(n_workers, len(tasks)),
                  initializer=workers.init_worker,
                  initargs=init_args) as pool:
        it = pool.imap(worker_fn, tasks) if ordered else \
            pool.imap_unordered(worker_fn, tasks)
        for result in it:
            yield result


class RunManifest:
    """Tracks completed chunks; a restart skips finished work and reuses
    the per-chunk shard files."""

    def __init__(self, path, shard_dir=None):
        self.path = path
        self.shard_dir = shard_dir or os.path.join(
            os.path.dirname(path), "intermediate_shards")
        os.makedirs(self.shard_dir, exist_ok=True)
        self.done = {}
        if os.path.exists(path):
            try:
                with open(path) as fh:
                    self.done = json.load(fh)
            except (ValueError, OSError):
                self.done = {}
        # drop entries whose shard files vanished
        self.done = {k: v for k, v in self.done.items() if os.path.exists(v)}

    @staticmethod
    def chunk_key(stage, chunk):
        return "%s:%s:%d-%d" % (stage, chunk["chrom"], chunk["start"],
                                chunk["end"])

    def is_done(self, stage, chunk):
        return self.chunk_key(stage, chunk) in self.done

    def shard_path(self, stage, chunk):
        return self.done.get(self.chunk_key(stage, chunk))

    def mark_done(self, stage, chunk, shard_path):
        self.done[self.chunk_key(stage, chunk)] = shard_path
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.done, fh)
        os.replace(tmp, self.path)


class Progress:
    """Minimal progress reporter (tqdm when available and a TTY)."""

    def __init__(self, total, desc, suppress=False):
        self.n = 0
        self.total = total
        self.desc = desc
        self.suppress = suppress
        self._bar = None
        if not suppress:
            try:
                from tqdm import tqdm

                self._bar = tqdm(total=total, desc=desc)
            except ImportError:
                pass

    def update(self, k=1):
        self.n += k
        if self._bar is not None:
            self._bar.update(k)

    def close(self):
        if self._bar is not None:
            self._bar.close()
