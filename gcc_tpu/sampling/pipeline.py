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
from gcc_tpu.graph.batch import CompactWireBatch, WireBatch, pack_edge_ids
from gcc_tpu.graph.corpus import CorpusStore, partition_graphs
from gcc_tpu.sampling import native
from gcc_tpu.sampling.sampler import (
    rwr_budgets,
    sample_contrastive_pairs_raw,
)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    batch_size: int = 32
    n_max: int = 512
    e_max: int = 8192
    num_samples: int = 2000   # per worker per epoch (reference --num-samples)
    num_workers: int = 1      # 0 = synchronous in-process
    num_copies: int = 1
    # Deep enough that a 16-step dispatch (training/loop.py) draining
    # 16 pairs at once never starves; compact batches are ~13 KB each.
    prefetch: int = 32
    threads_per_worker: int = 1
    degree_power: float = 0.75
    # "thread": background prefetch threads (default — the native sampler
    #   releases the GIL, and forking a process that shares a live TPU
    #   client risks deadlocks/tunnel corruption).
    # "process": forked worker processes (multi-core hosts without a
    #   remote-TPU client in the parent).
    mode: str = "thread"
    # Pairs sampled per native-sampler call: one big C++ call is sliced
    # into `super_batch` wire pairs, amortizing the Python call overhead.
    super_batch: int = 8
    # Ship batches as CompactWireBatch (flat packed edge buffer of
    # e_tot slots) instead of padded (B, E_max) int16 rows: ~8x fewer
    # wire bytes at the canonical config. The relay tunnel rate-shapes
    # sustained host→device traffic (~10 MB/s measured), so wire bytes
    # bound steady-state training throughput; the device-side scatter
    # re-expansion (~1 ms/step) is the cheaper side of that trade.
    # e_tot=None → auto-sized by PretrainPipeline at startup: it samples
    # a probe super-batch over the whole corpus and sets e_tot to 1.5x
    # the largest observed batch edge total (rounded up to 512). Wire
    # bytes bound steady-state throughput through the relay, so shipping
    # a buffer sized to the corpus instead of the worst-case formula
    # (batch_size * e_max // 4) cuts step time directly — measured 4x
    # oversizing at the canonical bench config (docs/PERF.md). Overflow
    # truncates host-side with exact counts kept and a warning.
    # A bare ShardSampler (no pipeline) falls back to the formula.
    compact_wire: bool = True
    e_tot: int | None = None
    # "pairs": iterator yields one (query, key) wire pair per step.
    # "stacked": yields one stacked pair per super_batch — CompactWireBatch
    #   with (super_batch, e_tot) edges / (super_batch, 3, B) meta leaves,
    #   exactly the multi-step dispatch layout (training/packed.py). The
    #   native compaction already produces these stacked buffers, so this
    #   skips per-step slicing, K queue hops and the consumer's re-stack —
    #   the sampler's Python cost per batch-pair was ~0.4 ms on the 2-core
    #   host, about a quarter of the whole step (docs/PERF.md). Requires
    #   compact_wire + the native sampler + n_max <= 256.
    emit: str = "pairs"


class ShardSampler:
    """Sampling logic for one worker's corpus shard (one or more graphs)."""

    def __init__(self, store: CorpusStore, graph_ids: list[int],
                 cfg: SamplerConfig, pcfg: PipelineConfig, seed: int):
        self.graphs = [store.load(i) for i in graph_ids]
        self.cfg = cfg
        self.pcfg = pcfg
        self.rng_seed = seed
        # deg^0.75 seed sampling over the shard (graph_dataset.py:86-92).
        from gcc_tpu.sampling.sampler import degree_weights

        self.weights = degree_weights(self.graphs, pcfg.degree_power)
        self.offsets = np.cumsum(
            [0] + [g.num_nodes for g in self.graphs]
        )
        self._cdf = np.ascontiguousarray(np.cumsum(self.weights))
        self._sample_counter = 0
        self._ready: list = []
        self._wire_buf = None    # reused (bsz, e_max) super-batch buffers
        self._native_buf = None  # reused native-call output buffers
        self.dropped_edges = 0       # compact-wire overflow accounting
        self.truncated_batches = 0

    def next_pair(self) -> tuple[WireBatch, WireBatch]:
        if not self._ready:
            self._ready = list(self._sample_super_batch())
        return self._ready.pop(0)

    def _sample_super_batch(self):
        """Sample `super_batch` (query, key) pairs in one fused native
        call that writes int16 wire buffers directly — the GIL stays
        released for the whole sampling+packing stage, and the Python
        cost per pair is a couple of array slices."""
        bsz = self.pcfg.batch_size * max(1, self.pcfg.super_batch)
        e_max = self.pcfg.e_max
        base = self._sample_counter
        self._sample_counter += bsz
        flat = native.weighted_sample(
            self.weights, bsz,
            rng_seed=hash((self.rng_seed, base)) & (2**63 - 1),
            cdf=self._cdf,
        )
        # flat node id -> (graph, node)
        gidx = np.searchsorted(self.offsets, flat, side="right") - 1
        nidx = flat - self.offsets[gidx]

        # Reused across super-batches: allocating/zeroing ~4 MB of int16
        # buffers per call costs more than the sampling itself on the
        # 2-core host. Row tails past n_edges hold stale bytes, which
        # every consumer masks (device expand) or skips (compaction).
        if self._wire_buf is None:
            self._wire_buf = tuple(
                np.empty((bsz, e_max), np.int16) for _ in range(4)
            ) + (np.empty((4, bsz), np.int32),)
        q_src, q_dst, k_src, k_dst, counts = self._wire_buf
        if self._native_buf is None and native.native_available():
            self._native_buf = tuple(
                np.empty((bsz, e_max), np.int16) if j % 4 < 2
                else np.empty(bsz, np.int32)
                for j in range(8)
            )

        # The fused path assumes key seed == query seed (step_dist[0]==1,
        # the default); the generic path handles step_dist walks.
        use_fused = (native.native_available()
                     and self.cfg.step_dist[0] == 1.0)
        for g_id in np.unique(gidx):
            mask = gidx == g_id
            rows = np.where(mask)[0]
            graph = self.graphs[int(g_id)]
            seeds = nidx[mask]
            ids = base + rows
            if use_fused:
                budgets = rwr_budgets(graph, seeds, self.cfg,
                                      degree_power=True)
                s = len(rows)
                out = native.sample_wire_pairs(
                    graph, seeds, seeds, budgets, budgets,
                    self.cfg.restart_prob, self.cfg.aug,
                    self.cfg.num_neighbors, self.cfg.rw_hops,
                    self.rng_seed, ids, self.pcfg.n_max, e_max,
                    n_threads=self.pcfg.threads_per_worker,
                    out=tuple(b[:s] for b in self._native_buf),
                )
                q_src[rows], q_dst[rows] = out[0], out[1]
                counts[0][rows], counts[1][rows] = out[2], out[3]
                k_src[rows], k_dst[rows] = out[4], out[5]
                counts[2][rows], counts[3][rows] = out[6], out[7]
            else:
                out_q, out_k = sample_contrastive_pairs_raw(
                    graph, seeds, self.cfg, rng_seed=self.rng_seed,
                    sample_ids=ids,
                    n_threads=self.pcfg.threads_per_worker,
                    node_cap=self.pcfg.n_max, e_cap=e_max,
                )
                q_src[rows] = out_q.src
                q_dst[rows] = out_q.dst
                counts[0][rows], counts[1][rows] = out_q.n, out_q.e
                k_src[rows] = out_k.src
                k_dst[rows] = out_k.dst
                counts[2][rows], counts[3][rows] = out_k.n, out_k.e

        pairs = []
        step = self.pcfg.batch_size
        compact = self.pcfg.compact_wire
        e_tot = self.pcfg.e_tot or (step * e_max // 4)
        if (compact and self.pcfg.n_max <= 256
                and native.native_available()):
            # Fused native compaction + uint16 packing for the whole
            # super-batch (one call instead of a python loop of
            # compact_rows + numpy shift/or per batch — ~0.2 ms per
            # batch-pair of pure dispatch overhead).
            n_b = bsz // step
            qe, qm, qd = native.compact_pack16(
                q_src, q_dst, counts[0], counts[1], n_b, step, e_tot)
            ke, km, kd = native.compact_pack16(
                k_src, k_dst, counts[2], counts[3], n_b, step, e_tot)
            self._account_drops(int(qd.sum() + kd.sum()),
                                int((qd > 0).sum() + (kd > 0).sum()), e_tot)
            if self.pcfg.emit == "stacked":
                # One stacked item per super-batch: the native buffers
                # are already (n_b, e_tot)/(n_b, 3, step) — ship them
                # whole, no per-step slicing or consumer re-stack.
                return [(
                    CompactWireBatch(edges=qe, meta=qm, e_max=e_max,
                                     id_bits=8),
                    CompactWireBatch(edges=ke, meta=km, e_max=e_max,
                                     id_bits=8),
                )]
            return [
                (CompactWireBatch(edges=qe[b], meta=qm[b], e_max=e_max,
                                  id_bits=8),
                 CompactWireBatch(edges=ke[b], meta=km[b], e_max=e_max,
                                  id_bits=8))
                for b in range(n_b)
            ]
        for lo in range(0, bsz, step):
            hi = lo + step
            if compact:
                pairs.append((
                    self._compact(q_src[lo:hi], q_dst[lo:hi],
                                  counts[0, lo:hi], counts[1, lo:hi],
                                  e_tot, e_max),
                    self._compact(k_src[lo:hi], k_dst[lo:hi],
                                  counts[2, lo:hi], counts[3, lo:hi],
                                  e_tot, e_max),
                ))
            else:
                # .copy(): the underlying buffers are reused by the next
                # super-batch while these batches sit in the prefetch queue.
                pairs.append((
                    WireBatch(src=q_src[lo:hi].copy(), dst=q_dst[lo:hi].copy(),
                              n_nodes=counts[0, lo:hi].copy(),
                              n_edges=counts[1, lo:hi].copy(),
                              seed_pos=np.zeros(step, np.int32)),
                    WireBatch(src=k_src[lo:hi].copy(), dst=k_dst[lo:hi].copy(),
                              n_nodes=counts[2, lo:hi].copy(),
                              n_edges=counts[3, lo:hi].copy(),
                              seed_pos=np.zeros(step, np.int32)),
                ))
        return pairs

    def _account_drops(self, dropped: int, batches: int, e_tot: int):
        """Surface compact-wire overflow: trailing graphs lost edges
        (counts in n_edges stay exact, so training sees fewer edges,
        never corrupt ones). A corpus whose edge distribution exceeds
        the e_tot sizing should raise PipelineConfig.e_tot."""
        if dropped <= 0:
            return
        first = self.truncated_batches == 0
        self.dropped_edges += dropped
        self.truncated_batches += batches
        if first or self.truncated_batches in (100, 10_000):
            import sys

            print(
                f"gcc_tpu sampler: compact-wire overflow — dropped "
                f"{dropped} edges (batch sum > e_tot={e_tot}); "
                f"{self.truncated_batches} batches affected so far. "
                f"Raise PipelineConfig.e_tot.", file=sys.stderr,
            )

    def _compact(self, src, dst, n, e, e_tot: int,
                 e_max: int) -> CompactWireBatch:
        c_src, c_dst, c_e, total = native.compact_rows(src, dst, e, e_tot)
        dropped = int(np.asarray(e, np.int64).sum()) - total
        self._account_drops(dropped, 1 if dropped > 0 else 0, e_tot)
        meta = np.stack([np.asarray(n, np.int32), c_e,
                         np.zeros(len(n), np.int32)])
        packed, id_bits = pack_edge_ids(c_src, c_dst, self.pcfg.n_max)
        return CompactWireBatch(
            edges=packed, meta=meta, e_max=e_max, id_bits=id_bits,
        )


def _probe_e_tot(store: CorpusStore, cfg: SamplerConfig,
                 pcfg: PipelineConfig, seed: int) -> int:
    """Size the compact-wire buffer from the corpus's actual edge totals.

    Samples one probe super-batch over the whole corpus (its own RNG
    stream — the training stream is untouched) and returns 1.5x the
    largest observed per-batch edge total, rounded up to 512. Decided
    ONCE here, before workers start, so every worker ships the same
    shape and the train step compiles exactly once. The 1.5x margin plus
    the host-side truncation backstop (exact counts kept, warning
    printed) covers epoch-to-epoch variation.

    Multi-host runs must pass an explicit ``e_tot``: each host probes
    its own corpus shard, and differing results would give hosts
    mismatched global-batch shapes (parallel/multihost.py)."""
    probe_cfg = dataclasses.replace(pcfg, compact_wire=False)
    shard = ShardSampler(store, list(range(len(store.graph_sizes))),
                         cfg, probe_cfg, seed + 104_729)
    max_total = 0
    for _ in range(max(1, probe_cfg.super_batch)):
        q, k = shard.next_pair()
        max_total = max(max_total, int(np.asarray(q.n_edges).sum()),
                        int(np.asarray(k.n_edges).sum()))
    hard_cap = pcfg.batch_size * pcfg.e_max
    e_tot = int(np.ceil(max_total * 1.5 / 512)) * 512
    return int(np.clip(e_tot, 1024, hard_cap))


class _WorkerError:
    """Sentinel carrying a worker failure to the consumer."""

    def __init__(self, err: str):
        self.err = err


def _worker_main(store_path, graph_ids, cfg, pcfg, seed, out_q, stop_ev):
    try:
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
    except Exception:  # surface crashes instead of hanging the trainer
        import traceback

        try:
            out_q.put(_WorkerError(traceback.format_exc()), timeout=5)
        except Exception:
            pass


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
        if pcfg.emit == "stacked" and not (
            pcfg.compact_wire and pcfg.n_max <= 256
            and native.native_available()
        ):
            raise ValueError(
                "emit='stacked' requires compact_wire, n_max <= 256 and "
                "the native sampler (the stacked buffers come from "
                "gcc_compact_pack16)"
            )
        if pcfg.compact_wire and pcfg.e_tot is None:
            pcfg = dataclasses.replace(
                pcfg, e_tot=_probe_e_tot(store, cfg, pcfg, seed)
            )
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
            item = self._queue.get()
            if isinstance(item, _WorkerError):
                raise RuntimeError(f"sampler worker crashed:\n{item.err}")
            return item
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
