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

    Failure detection (SURVEY.md §5.3 — the reference hangs on
    worker-death joins): a crashed/killed worker surfaces as
    BrokenProcessPool; the unfinished chunks are requeued ONCE in a
    fresh pool, and a second failure raises a clean RuntimeError (the
    run manifest still points at all completed shards) instead of
    hanging.
    """
    from . import workers

    tasks = list(enumerate(chunks))
    if n_workers <= 1 or len(tasks) <= 1:
        workers.init_worker(*init_args)
        for task in tasks:
            yield worker_fn(task)
        workers._G.clear()
        return
    yield from _pool_stream(tasks, worker_fn, init_args, n_workers, ordered)


def _pool_stream(tasks, worker_fn, init_args, n_workers, ordered):
    import sys
    from concurrent.futures import ProcessPoolExecutor, as_completed
    from concurrent.futures.process import BrokenProcessPool

    from . import workers

    remaining = list(tasks)
    for attempt in (1, 2):
        delivered = set()
        try:
            ctx = mp.get_context("spawn")
            ex = ProcessPoolExecutor(
                max_workers=min(n_workers, len(remaining)),
                mp_context=ctx, initializer=workers.init_worker,
                initargs=init_args)
            try:
                futs = [(ex.submit(worker_fn, t), t) for t in remaining]
                pairs = futs if ordered else (
                    (f, t) for f, t in _completed_pairs(futs, as_completed))
                for f, t in pairs:
                    result = f.result()  # raises BrokenProcessPool on death
                    delivered.add(t[0])
                    yield result
            finally:
                # consumer errors / Ctrl-C / generator close must not
                # wait out the whole queued feature backlog
                ex.shutdown(wait=True, cancel_futures=True)
            return
        except BrokenProcessPool:
            remaining = [t for t in remaining if t[0] not in delivered]
            if attempt == 2 or not remaining:
                raise RuntimeError(
                    "feature worker died (killed/OOM?); %d chunk(s) "
                    "unfinished after retry — completed chunks are in the "
                    "run manifest, rerun with --resume" % len(remaining))
            print("warning: feature worker died; requeueing %d chunk(s) "
                  "in a fresh pool" % len(remaining), file=sys.stderr)


def _completed_pairs(futs, as_completed):
    by_fut = dict(futs)
    for f in as_completed(by_fut):
        yield f, by_fut[f]


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
        from .watchdog import beat

        beat()
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
        from .watchdog import beat

        beat()
        self.n += k
        if self._bar is not None:
            self._bar.update(k)

    def close(self):
        if self._bar is not None:
            self._bar.close()
