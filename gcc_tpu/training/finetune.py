"""Supervised fine-tuning (reference train_finetune, train.py:175-337).

Encoder + linear classification head trained with cross-entropy,
gradients clipped by value 1 (train.py:227-228), warmup-linear LR on the
same triangular schedule as pretraining, 10-fold stratified CV driver
(train.py:800-815). The reference uses two separate Adam optimizers with
identical hyperparameters for encoder and head — mathematically
equivalent to one Adam over the joint parameter tree, which is what we
use. BatchNorm running statistics are reset when loading pretrained
weights (reference clear_bn, train.py:652-657).

Node-level datasets resample each node's RWR subgraph every epoch (an
implicit augmentation in the reference's __getitem__,
graph_dataset.py:388-433); graph-level datasets are encoded whole and
fixed (graph_dataset.py:362).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gcc_tpu.config import TrainConfig
from gcc_tpu.features import featurize_batch
from gcc_tpu.graph.batch import PaddedSubgraphBatch, Subgraph, batch_subgraphs
from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.models import GraphEncoder
from gcc_tpu.models.layers import Linear
from gcc_tpu.training.optim import build_optimizer
from gcc_tpu.training.schedules import make_lr_schedule

import flax.linen as nn


class ClassifierHead(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x):
        return Linear(self.num_classes)(x)


class FinetuneState(NamedTuple):
    params: Any          # {"encoder": ..., "head": ...}
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    dropout_rng: jax.Array


def reset_batch_stats(batch_stats):
    """Zero means / unit vars — the reference's BN reset on finetune load."""
    def reset(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jnp.zeros_like(x)
        if name == "var":
            return jnp.ones_like(x)
        return x

    return jax.tree_util.tree_map_with_path(reset, batch_stats)


def create_finetune_state(
    rng: jax.Array,
    cfg: TrainConfig,
    num_classes: int,
    sample_batch: PaddedSubgraphBatch,
    total_steps: int,
    pretrained_params=None,
    pretrained_stats=None,
):
    enc = GraphEncoder(cfg.encoder)
    head = ClassifierHead(num_classes)
    enc_rng, head_rng, dropout_rng = jax.random.split(rng, 3)

    @jax.jit
    def _init(batch):
        feats = featurize_batch(
            batch, cfg.encoder.positional_embedding_size,
            pe_method=cfg.encoder.pe_method, profile="eval",
        )
        variables = enc.init(enc_rng, feats, train=False)
        emb = enc.apply(variables, feats, train=False)
        head_vars = head.init(head_rng, emb)
        return variables, head_vars

    variables, head_vars = _init(sample_batch)
    params = {"encoder": variables["params"], "head": head_vars["params"]}
    stats = variables.get("batch_stats", {})
    if pretrained_params is not None:
        params["encoder"] = pretrained_params
        stats = reset_batch_stats(
            pretrained_stats if pretrained_stats is not None else stats
        )
    tx = build_optimizer(
        cfg.optim,
        make_lr_schedule(cfg.optim.learning_rate, total_steps,
                         cfg.optim.warmup),
        clip_mode="value",
    )
    state = FinetuneState(
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        dropout_rng=dropout_rng,
    )
    return state, (enc, head), tx


def make_finetune_step(cfg: TrainConfig, modules, tx, num_classes: int):
    enc, head = modules
    pos_size = cfg.encoder.positional_embedding_size
    pe_method = cfg.encoder.pe_method

    def step_fn(state: FinetuneState, batch: PaddedSubgraphBatch,
                labels: jax.Array, example_mask: jax.Array):
        rng, new_rng = jax.random.split(state.dropout_rng)
        # Finetune datasets are tiny and accuracy-facing — keep the
        # eval-profile guarded PE here too (cost is once-per-dataset
        # scale, not the pretrain hot loop).
        feats = featurize_batch(batch, pos_size, pe_method=pe_method,
                                profile="eval")

        def loss_fn(params):
            emb, mut = enc.apply(
                {"params": params["encoder"],
                 "batch_stats": state.batch_stats},
                feats, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            logits = head.apply({"params": params["head"]}, emb)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            denom = jnp.maximum(example_mask.sum(), 1.0)
            loss = (nll * example_mask).sum() / denom
            correct = (logits.argmax(-1) == labels) * example_mask
            acc = correct.sum() / denom
            return loss, (mut["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = FinetuneState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1, dropout_rng=new_rng,
        )
        return new_state, {"loss": loss, "acc": acc}

    def eval_fn(state: FinetuneState, batch: PaddedSubgraphBatch,
                labels: jax.Array, example_mask: jax.Array):
        feats = featurize_batch(batch, pos_size, pe_method=pe_method,
                                profile="eval")
        emb = enc.apply(
            {"params": state.params["encoder"],
             "batch_stats": state.batch_stats},
            feats, train=False,
        )
        logits = head.apply({"params": state.params["head"]}, emb)
        preds = logits.argmax(-1)
        return preds

    return jax.jit(step_fn, donate_argnums=(0,)), jax.jit(eval_fn)


@dataclasses.dataclass
class LabeledSubgraphData:
    """Labeled examples as (subgraph sampler, labels)."""

    labels: np.ndarray

    def subgraphs_for(self, idx: np.ndarray, epoch_seed: int) -> list[Subgraph]:
        raise NotImplementedError


class NodeLabeledData(LabeledSubgraphData):
    """Per-node RWR subgraphs, resampled every epoch
    (NodeClassificationDatasetLabeled)."""

    def __init__(self, graph: CSRGraph, y: np.ndarray, cfg: TrainConfig,
                 n_max: int, e_max: int):
        super().__init__(labels=y.argmax(axis=1).astype(np.int64))
        self.graph = graph
        self.cfg = cfg
        self.n_max = n_max
        self.e_max = e_max
        self.num_classes = y.shape[1]

    def subgraphs_for(self, idx, epoch_seed):
        from gcc_tpu.sampling import native
        from gcc_tpu.sampling.sampler import rwr_budgets

        budgets = rwr_budgets(self.graph, idx, self.cfg.sampler,
                              degree_power=False)
        out = native.sample_subgraphs(
            self.graph, idx, budgets,
            restart_prob=self.cfg.sampler.restart_prob,
            aug=self.cfg.sampler.aug, expand=self.cfg.sampler.num_neighbors,
            hops=self.cfg.sampler.rw_hops, rng_seed=epoch_seed,
            sample_ids=idx, node_cap=self.n_max, e_cap=self.e_max,
            n_threads=2,
        )
        return [
            Subgraph(src=out.src[i, :out.e[i]].copy(),
                     dst=out.dst[i, :out.e[i]].copy(),
                     num_nodes=int(out.n[i]), seed=0)
            for i in range(len(idx))
        ]


class GraphLabeledData(LabeledSubgraphData):
    """Entire graphs, fixed (GraphClassificationDatasetLabeled)."""

    def __init__(self, graphs: list[CSRGraph], labels: np.ndarray,
                 n_max: int, e_max: int):
        super().__init__(labels=np.asarray(labels, np.int64))
        from gcc_tpu.sampling.sampler import entire_graph_subgraph

        self.subs = [entire_graph_subgraph(g) for g in graphs]
        self.num_classes = int(self.labels.max()) + 1
        self.n_max = n_max
        self.e_max = e_max

    def subgraphs_for(self, idx, epoch_seed):
        return [self.subs[i] for i in idx]


def run_finetune_fold(
    cfg: TrainConfig,
    data: LabeledSubgraphData,
    train_idx: np.ndarray,
    test_idx: np.ndarray,
    pretrained_params=None,
    pretrained_stats=None,
    log_fn=print,
) -> float:
    """Train one fold; returns test micro-F1 (== accuracy for single-label
    argmax predictions, reference train.py:300-337)."""
    n_max, e_max = data.n_max, data.e_max
    # Dense-adjacency memory guard for big entire-graph buckets
    # (REDDIT-scale): cap the batch so (B, N, N) stays under ~1 GB.
    bsz = min(cfg.batch_size, max(1, (1 << 30) // max(1, n_max * n_max * 4)))
    steps_per_epoch = max(1, int(np.ceil(len(train_idx) / bsz)))
    total_steps = steps_per_epoch * cfg.epochs

    sample_subs = data.subgraphs_for(train_idx[:bsz], epoch_seed=0)
    sample_batch = _pad_batch(sample_subs, bsz, n_max, e_max)[0]
    state, modules, tx = create_finetune_state(
        jax.random.PRNGKey(cfg.seed), cfg, data.num_classes,
        sample_batch, total_steps, pretrained_params, pretrained_stats,
    )
    step_fn, eval_fn = make_finetune_step(cfg, modules, tx, data.num_classes)

    rng = np.random.default_rng(cfg.seed)
    for epoch in range(cfg.epochs):
        order = rng.permutation(train_idx)
        for s in range(steps_per_epoch):
            idx = order[s * bsz : (s + 1) * bsz]
            subs = data.subgraphs_for(idx, epoch_seed=1000 + epoch)
            batch, mask = _pad_batch(subs, bsz, n_max, e_max)
            labels = np.zeros(bsz, np.int64)
            labels[: len(idx)] = data.labels[idx]
            state, metrics = step_fn(
                state, jax.device_put(batch), jnp.asarray(labels),
                jnp.asarray(mask),
            )
    # Test pass.
    preds_all = np.zeros(len(test_idx), np.int64)
    for s in range(0, len(test_idx), bsz):
        idx = test_idx[s : s + bsz]
        subs = data.subgraphs_for(idx, epoch_seed=999_999)
        batch, mask = _pad_batch(subs, bsz, n_max, e_max)
        preds = np.asarray(eval_fn(
            state, jax.device_put(batch),
            jnp.zeros(bsz, jnp.int32), jnp.asarray(mask),
        ))
        preds_all[s : s + len(idx)] = preds[: len(idx)]
    from sklearn.metrics import f1_score

    return float(f1_score(data.labels[test_idx], preds_all, average="micro"))


def run_finetune_cv(
    cfg: TrainConfig, data: LabeledSubgraphData,
    pretrained_params=None, pretrained_stats=None, folds=range(10),
    log_fn=print,
) -> dict:
    """10-fold CV driver (reference train.py:800-815)."""
    from sklearn.model_selection import StratifiedKFold

    skf = StratifiedKFold(n_splits=10, shuffle=True, random_state=cfg.seed)
    idx_list = list(skf.split(np.zeros(len(data.labels)), data.labels))
    scores = []
    for fold in folds:
        train_idx, test_idx = idx_list[fold]
        f1 = run_finetune_fold(cfg, data, train_idx, test_idx,
                               pretrained_params, pretrained_stats, log_fn)
        log_fn(f"fold {fold}: micro-F1 {f1:.4f}")
        scores.append(f1)
    return {"mean": float(np.mean(scores)), "std": float(np.std(scores)),
            "folds": scores}


def _pad_batch(subs: list[Subgraph], bsz: int, n_max: int, e_max: int):
    mask = np.zeros(bsz, np.float32)
    mask[: len(subs)] = 1.0
    if len(subs) < bsz:
        subs = subs + [subs[-1]] * (bsz - len(subs))
    return batch_subgraphs(subs, n_max=n_max, e_max=e_max), mask
