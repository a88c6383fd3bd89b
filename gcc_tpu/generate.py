"""Frozen-embedding generation (reference generate.py:33-125).

For every node (or graph, in entire-graph mode) of an evaluation
dataset: sample its RWR subgraph exactly as in pretraining, run BOTH the
query and key encoders in eval mode, and emit (feat_q + feat_k) / 2
(reference generate.py:52). The reference builds one giant batch of the
whole dataset; here batches stream through fixed-size buckets so the
same compiled program serves any dataset size.
"""

from __future__ import annotations

import numpy as np

import jax

from gcc_tpu.config import TrainConfig
from gcc_tpu.features import featurize_batch
from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.models import GraphEncoder
from gcc_tpu.sampling import native
from gcc_tpu.sampling.sampler import entire_graph_subgraph, rwr_budgets


def _eval_apply(enc, params, batch_stats, feats):
    return enc.apply(
        {"params": params, "batch_stats": batch_stats}, feats, train=False
    )


def generate_embeddings(
    cfg: TrainConfig,
    state,
    subgraphs: list[Subgraph],
    n_max: int = 512,
    e_max: int = 8192,
    batch_size: int = 64,
) -> np.ndarray:
    """Encode pre-built subgraphs with (model + model_ema)/2 in eval mode."""
    enc = GraphEncoder(cfg.encoder)

    # Dense adjacency memory guard: keep the batch's (B, N, N) blocks
    # under ~1 GB — entire-graph datasets (REDDIT-scale, up to ~4k
    # nodes) need small batches at big buckets.
    max_b = max(1, (1 << 30) // max(1, n_max * n_max * 4))
    batch_size = min(batch_size, max_b)

    # Checkpoint arrays are passed as jit *arguments*, not closed-over
    # constants — baked-in constants bloat the compiled program and are
    # pathologically slow through remote-compile relays.
    @jax.jit
    def encode(params, stats, ema_params, ema_stats, batch):
        feats = featurize_batch(
            batch, cfg.encoder.positional_embedding_size,
            pe_method=cfg.encoder.pe_method,
        )
        fq = _eval_apply(enc, params, stats, feats)
        fk = _eval_apply(enc, ema_params, ema_stats, feats)
        return (fq + fk) / 2.0

    weights = jax.device_put((state.params, state.batch_stats,
                              state.ema_params, state.ema_batch_stats))
    outs = []
    for i in range(0, len(subgraphs), batch_size):
        chunk = subgraphs[i : i + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = chunk + [chunk[-1]] * pad
        batch = batch_subgraphs(chunk, n_max=n_max, e_max=e_max)
        emb = np.asarray(encode(*weights, jax.device_put(batch)))
        outs.append(emb[: batch_size - pad])
    return np.concatenate(outs, axis=0)


def node_subgraphs(
    g: CSRGraph, cfg: TrainConfig, n_max: int, e_max: int,
    rng_seed: int = 0,
) -> list[Subgraph]:
    """Per-node RWR subgraphs with the map-style dataset budget
    (out-degree, no ^0.75 — reference graph_dataset.py:243-254 via
    NodeClassificationDataset)."""
    seeds = np.arange(g.num_nodes, dtype=np.int64)
    budgets = rwr_budgets(g, seeds, cfg.sampler, degree_power=False)
    out = native.sample_subgraphs(
        g, seeds, budgets, restart_prob=cfg.sampler.restart_prob,
        aug=cfg.sampler.aug, expand=cfg.sampler.num_neighbors,
        hops=cfg.sampler.rw_hops, rng_seed=rng_seed,
        node_cap=n_max, e_cap=e_max, n_threads=2,
    )
    subs = []
    for i in range(g.num_nodes):
        n_i, e_i = int(out.n[i]), int(out.e[i])
        subs.append(Subgraph(src=out.src[i, :e_i].copy(),
                             dst=out.dst[i, :e_i].copy(),
                             num_nodes=n_i, seed=0))
    return subs


def graph_subgraphs(graphs: list[CSRGraph]) -> list[Subgraph]:
    """Entire-graph mode for graph classification (reference
    graph_dataset.py:327-361)."""
    return [entire_graph_subgraph(g) for g in graphs]
