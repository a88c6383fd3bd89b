"""Streaming pretrain input pipeline (replaces torch DataLoader, N16).

The reference parallelizes sampling with DataLoader worker *processes*,
each owning a size-balanced partition of the corpus graphs
(graph_dataset.py:23-92). Here the same scheme runs as a pool of
forked sampler processes that push ready-to-ship padded (query, key)
batch pairs over a queue; the training loop overlaps host sampling with
device compute by keeping a couple of batches in flight. A synchronous
in-process mode serves tests and low-CPU hosts.

Static-shape policy: every batch is packed into one configured
(n_max, e_max) bucket so the train step compiles exactly once. Subgraphs
whose RWR budget would exceed the bucket are truncated at the bucket
size by the native sampler (node_cap/e_cap) — a bounded deviation from
the reference, which has no cap; with rw_hops=256 and n_max=512 only
seeds of degree > ~485 are affected.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import queue as queue_mod
from typing import Iterator

import numpy as np

from gcc_tpu.config import SamplerConfig
from gcc_tpu.graph.batch import (
    PaddedSubgraphBatch,
    Subgraph,
    batch_subgraphs,
    pick_bucket,
)
from gcc_tpu.graph.corpus import CorpusStore, partition_graphs
from gcc_tpu.sampling import native
from gcc_tpu.sampling.sampler import rwr_budgets, sample_contrastive_pairs


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    batch_size: int = 32
    n_max: int = 512
    e_max: int = 8192
    num_samples: int = 2000   # per worker per epoch (reference --num-samples)
    num_workers: int = 1      # 0 = synchronous in-process
    num_copies: int = 1
    prefetch: int = 4
    threads_per_worker: int = 1
    degree_power: float = 0.75
    # "thread": background prefetch threads (default — the native sampler
    #   releases the GIL, and forking a process that shares a live TPU
    #   client risks deadlocks/tunnel corruption).
    # "process": forked worker processes (multi-core hosts without a
    #   remote-TPU client in the parent).
    mode: str = "thread"


class ShardSampler:
    """Sampling logic for one worker's corpus shard (one or more graphs)."""

    def __init__(self, store: CorpusStore, graph_ids: list[int],
                 cfg: SamplerConfig, pcfg: PipelineConfig, seed: int):
        self.graphs = [store.load(i) for i in graph_ids]
        self.cfg = cfg
        self.pcfg = pcfg
        self.rng_seed = seed
        # deg^0.75 seed sampling over the shard (graph_dataset.py:86-92).
        self.weights = np.concatenate(
            [np.diff(g.indptr).astype(np.float64) ** pcfg.degree_power
             for g in self.graphs]
        )
        self.offsets = np.cumsum(
            [0] + [g.num_nodes for g in self.graphs]
        )
        self._sample_counter = 0

    def next_pair(self) -> tuple[PaddedSubgraphBatch, PaddedSubgraphBatch]:
        bsz = self.pcfg.batch_size
        base = self._sample_counter
        self._sample_counter += bsz
        flat = native.weighted_sample(
            self.weights, bsz, rng_seed=hash((self.rng_seed, base)) & (2**63 - 1)
        )
        # flat node id -> (graph, node)
        gidx = np.searchsorted(self.offsets, flat, side="right") - 1
        nidx = flat - self.offsets[gidx]

        qs: list[Subgraph] = []
        ks: list[Subgraph] = []
        for g_id in np.unique(gidx):
            mask = gidx == g_id
            sub_q, sub_k = sample_contrastive_pairs(
                self.graphs[int(g_id)],
                nidx[mask],
                self.cfg,
                rng_seed=self.rng_seed,
                sample_ids=base + np.where(mask)[0],
                n_threads=self.pcfg.threads_per_worker,
                node_cap=self.pcfg.n_max,
                e_cap=self.pcfg.e_max,
            )
            qs.extend(sub_q)
            ks.extend(sub_k)
        return (
            batch_subgraphs(qs, n_max=self.pcfg.n_max, e_max=self.pcfg.e_max),
            batch_subgraphs(ks, n_max=self.pcfg.n_max, e_max=self.pcfg.e_max),
        )


def _worker_main(store_path, graph_ids, cfg, pcfg, seed, out_q, stop_ev):
    store = CorpusStore.open(store_path)
    shard = ShardSampler(store, graph_ids, cfg, pcfg, seed)
    while not stop_ev.is_set():
        pair = shard.next_pair()
        while not stop_ev.is_set():
            try:
                out_q.put(pair, timeout=0.5)
                break
            except queue_mod.Full:
                continue


class PretrainPipeline:
    """Iterator of (query, key) padded batches over a corpus.

    num_workers=0 runs synchronously in-process; otherwise forked worker
    processes each own a greedy size-balanced shard of the corpus
    (num_copies replicates the assignment, reference graph_dataset.py:76).
    """

    def __init__(self, store: CorpusStore, cfg: SamplerConfig,
                 pcfg: PipelineConfig, seed: int = 0):
        self.store = store
        self.cfg = cfg
        self.pcfg = pcfg
        self.seed = seed
        self._procs: list = []
        self._queue = None
        self._stop = None
        if pcfg.num_workers > 0:
            if pcfg.mode == "process":
                self._start_processes()
            else:
                self._start_threads()
        else:
            jobs = partition_graphs(store.graph_sizes, 1)
            self._shard = ShardSampler(store, jobs[0], cfg, pcfg, seed)

    def _start_threads(self):
        import threading

        self._queue = queue_mod.Queue(maxsize=self.pcfg.prefetch)
        self._stop = threading.Event()
        jobs = partition_graphs(
            self.store.graph_sizes, self.pcfg.num_workers, self.pcfg.num_copies
        )
        for w, graph_ids in enumerate(jobs):
            t = threading.Thread(
                target=_worker_main,
                args=(self.store.path, graph_ids, self.cfg, self.pcfg,
                      self.seed + 7919 * (w + 1), self._queue, self._stop),
                daemon=True,
            )
            t.start()
            self._procs.append(t)

    def _start_processes(self):
        ctx = mp.get_context("fork")
        self._queue = ctx.Queue(maxsize=self.pcfg.prefetch)
        self._stop = ctx.Event()
        jobs = partition_graphs(
            self.store.graph_sizes, self.pcfg.num_workers, self.pcfg.num_copies
        )
        for w, graph_ids in enumerate(jobs):
            p = ctx.Process(
                target=_worker_main,
                args=(self.store.path, graph_ids, self.cfg, self.pcfg,
                      self.seed + 7919 * (w + 1), self._queue, self._stop),
                daemon=True,
            )
            p.start()
            self._procs.append(p)

    def __iter__(self) -> Iterator[tuple[PaddedSubgraphBatch, PaddedSubgraphBatch]]:
        return self

    def __next__(self):
        if self._queue is not None:
            return self._queue.get()
        return self._shard.next_pair()

    @property
    def steps_per_epoch(self) -> int:
        workers = max(1, self.pcfg.num_workers)
        return self.pcfg.num_samples * workers // self.pcfg.batch_size

    def close(self):
        if self._stop is not None:
            self._stop.set()
            # Drain so producers blocked on a full queue can observe stop.
            try:
                while True:
                    self._queue.get_nowait()
            except queue_mod.Empty:
                pass
            for p in self._procs:
                p.join(timeout=2)
                if hasattr(p, "terminate") and p.is_alive():
                    p.terminate()
            self._procs = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
