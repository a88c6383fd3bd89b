"""End-to-end integration: corpus → pipeline → pretrain → checkpoint →
generate → downstream eval.

The reference's tests assert accuracy floors on real datasets with
downloaded checkpoints (tests/test_node_classification.py:44-65); this
environment has no network, so the integration floor here is synthetic:
embeddings pretrained on a structured graph must beat chance on a
structure-derived label task.
"""

import json
import os

import numpy as np
import pytest

import jax

from gcc_tpu.config import (
    ContrastConfig, EncoderConfig, OptimConfig, SamplerConfig, TrainConfig,
)
from gcc_tpu.graph.corpus import CorpusStore, partition_graphs, synthetic_corpus
from gcc_tpu.graph.csr import CSRGraph
from gcc_tpu.sampling.pipeline import PipelineConfig, PretrainPipeline
from gcc_tpu.training.checkpoint import load_checkpoint, load_config, save_checkpoint
from gcc_tpu.training.loop import run_pretrain
from gcc_tpu.generate import generate_embeddings, node_subgraphs
from gcc_tpu.tasks import evaluate_node_embeddings


def tiny_cfg(moco=False, epochs=2):
    return TrainConfig(
        batch_size=8,
        epochs=epochs,
        num_samples=64,
        num_workers=0,
        sampler=SamplerConfig(rw_hops=16),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=moco, nce_k=32),
        optim=OptimConfig(learning_rate=0.01),
    )


def test_corpus_roundtrip(tmp_path):
    store = synthetic_corpus(str(tmp_path / "corpus"), num_graphs=3,
                             nodes_per_graph=500, avg_degree=6)
    store2 = CorpusStore.open(str(tmp_path / "corpus"))
    assert store2.num_graphs == 3
    g = store2.load(0)
    assert g.num_nodes == store2.graph_sizes[0]
    assert g.num_edges > 0
    # mmap-backed arrays
    g2 = store2.load(0, mmap=True)
    np.testing.assert_array_equal(np.asarray(g.indices), np.asarray(g2.indices))


def test_partition_balance():
    jobs = partition_graphs([100, 90, 10, 10, 5], num_workers=2)
    loads = [sum([100, 90, 10, 10, 5][i] for i in j) for j in jobs]
    assert abs(loads[0] - loads[1]) <= 85  # greedy: 100+5+10 vs 90+10 etc.
    jobs4 = partition_graphs([100, 90], num_workers=4, num_copies=2)
    assert len(jobs4) == 4  # replicated assignment


def test_pipeline_sync_and_workers(tmp_path):
    store = synthetic_corpus(str(tmp_path / "c"), num_graphs=2,
                             nodes_per_graph=400, avg_degree=6)
    scfg = SamplerConfig(rw_hops=8)
    pcfg = PipelineConfig(batch_size=4, n_max=32, e_max=256, num_samples=16,
                          num_workers=0)
    with PretrainPipeline(store, scfg, pcfg) as pipe:
        bq, bk = next(pipe)
        from gcc_tpu.graph.batch import CompactWireBatch

        expect = ((pipe.pcfg.e_tot,) if isinstance(bq, CompactWireBatch)
                  else (4, 256))
        assert bq.batch_size == 4 and bq.src.shape == expect
        assert pipe.steps_per_epoch == 4
    # Worker-process mode produces batches too.
    pcfg2 = PipelineConfig(batch_size=4, n_max=32, e_max=256, num_samples=16,
                           num_workers=2)
    with PretrainPipeline(store, scfg, pcfg2) as pipe:
        bq, bk = next(pipe)
        assert bq.batch_size == 4
        bq2, _ = next(pipe)
        assert bq2.batch_size == 4


def test_compact_wire_e_tot_autosizing(tmp_path):
    """e_tot=None → probed from the corpus ONCE at pipeline startup:
    512-aligned, covering the probe's max batch edge total with margin,
    deterministic for a fixed (corpus, config, seed), and every emitted
    batch ships that exact shape."""
    store = synthetic_corpus(str(tmp_path / "c"), num_graphs=2,
                             nodes_per_graph=400, avg_degree=6)
    scfg = SamplerConfig(rw_hops=8)
    pcfg = PipelineConfig(batch_size=4, n_max=32, e_max=256, num_samples=16,
                          num_workers=0)
    with PretrainPipeline(store, scfg, pcfg, seed=3) as pipe:
        e_tot = pipe.pcfg.e_tot
        assert e_tot is not None and e_tot % 512 == 0
        assert 1024 <= e_tot <= 4 * 256
        for _ in range(3):
            bq, bk = next(pipe)
            assert bq.edges.shape == (e_tot,) == bk.edges.shape
            assert int(np.asarray(bq.meta[1]).sum()) <= e_tot
    with PretrainPipeline(store, scfg, pcfg, seed=3) as pipe2:
        assert pipe2.pcfg.e_tot == e_tot  # deterministic probe
    # Explicit override wins.
    import dataclasses as dc

    with PretrainPipeline(store, scfg, dc.replace(pcfg, e_tot=2048)) as pipe3:
        assert pipe3.pcfg.e_tot == 2048
        bq, _ = next(pipe3)
        assert bq.edges.shape == (2048,)


@pytest.mark.parametrize("moco", [False, True])
def test_run_pretrain_and_checkpoint(tmp_path, moco):
    corpus = str(tmp_path / "c")
    synthetic_corpus(corpus, num_graphs=2, nodes_per_graph=300, avg_degree=6)
    cfg = tiny_cfg(moco=moco)
    pcfg = PipelineConfig(batch_size=8, n_max=32, e_max=512, num_samples=64,
                          num_workers=0)
    summary = run_pretrain(cfg, corpus, str(tmp_path / "out"), pcfg,
                           log_fn=lambda s: None)
    assert summary["steps"] == 16
    run_dir = summary["run_dir"]
    assert os.path.exists(os.path.join(run_dir, "current"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 16
    assert all(np.isfinite(l["loss"]) for l in lines)
    # Config sidecar restores.
    cfg2 = load_config(run_dir)
    assert cfg2.contrast.moco == moco
    # Checkpoint restores into a pytree with the queue present.
    state = load_checkpoint(os.path.join(run_dir, "current"))
    assert "params" in state and "queue" in state
    assert state["queue"]["memory"].shape == (32, 16)


def community_graph(n_comm=4, size=30, seed=0):
    """Blocks with dense intra-community edges: community id is
    recoverable from structure, giving a label task for the floor test."""
    rng = np.random.default_rng(seed)
    src, dst = [], []
    for c in range(n_comm):
        base = c * size
        # Ring + random chords inside the community.
        for i in range(size):
            src.append(base + i)
            dst.append(base + (i + 1) % size)
        extra = 3 * size if c % 2 == 0 else size // 2  # density differs
        s = rng.integers(0, size, extra) + base
        d = rng.integers(0, size, extra) + base
        src.extend(s.tolist())
        dst.extend(d.tolist())
    # Sparse inter-community links.
    s = rng.integers(0, n_comm * size, n_comm * 2)
    d = rng.integers(0, n_comm * size, n_comm * 2)
    src.extend(s.tolist())
    dst.extend(d.tolist())
    src, dst = np.array(src), np.array(dst)
    keep = src != dst
    g = CSRGraph.from_edges(src[keep], dst[keep], num_nodes=n_comm * size,
                            symmetrize=True)
    labels = np.repeat(np.arange(n_comm) % 2, size)  # density class
    y = np.zeros((n_comm * size, 2), np.float32)
    y[np.arange(n_comm * size), labels] = 1
    return g, y


def test_generate_and_eval_above_chance(tmp_path):
    corpus = str(tmp_path / "c")
    synthetic_corpus(corpus, num_graphs=2, nodes_per_graph=400, avg_degree=8)
    cfg = tiny_cfg(moco=False, epochs=3)
    pcfg = PipelineConfig(batch_size=8, n_max=32, e_max=512, num_samples=64,
                          num_workers=0)
    summary = run_pretrain(cfg, corpus, str(tmp_path / "out"), pcfg,
                           log_fn=lambda s: None)
    state = load_checkpoint(os.path.join(summary["run_dir"], "current"))
    from types import SimpleNamespace

    state = SimpleNamespace(**state)

    g, y = community_graph()
    subs = node_subgraphs(g, cfg, n_max=32, e_max=512)
    emb = generate_embeddings(cfg, state, subs, n_max=32, e_max=512,
                              batch_size=16)
    assert emb.shape == (g.num_nodes, 16)
    assert np.isfinite(emb).all()
    res = evaluate_node_embeddings(emb, y)
    # Structural embeddings must separate dense from sparse communities
    # clearly better than the 0.5 chance rate.
    assert res["Micro-F1"] > 0.6, res


def test_pipeline_thread_mode(tmp_path):
    store = synthetic_corpus(str(tmp_path / "ct"), num_graphs=2,
                             nodes_per_graph=400, avg_degree=6)
    scfg = SamplerConfig(rw_hops=8)
    pcfg = PipelineConfig(batch_size=4, n_max=32, e_max=256, num_samples=16,
                          num_workers=2, mode="thread")
    with PretrainPipeline(store, scfg, pcfg) as pipe:
        for _ in range(5):
            bq, bk = next(pipe)
            assert bq.batch_size == 4


def test_run_pretrain_resume(tmp_path):
    corpus = str(tmp_path / "c")
    synthetic_corpus(corpus, num_graphs=1, nodes_per_graph=300, avg_degree=6)
    cfg = tiny_cfg(moco=True, epochs=1)
    pcfg = PipelineConfig(batch_size=8, n_max=32, e_max=512, num_samples=32,
                          num_workers=0)
    s1 = run_pretrain(cfg, corpus, str(tmp_path / "out"), pcfg,
                      log_fn=lambda s: None)
    ckpt = os.path.join(s1["run_dir"], "current")
    s2 = run_pretrain(cfg, corpus, str(tmp_path / "out2"), pcfg,
                      log_fn=lambda s: None, resume=ckpt)
    # Resumed run continues from the saved step (4 + 4 steps).
    assert s2["steps"] == 4
    state = load_checkpoint(os.path.join(s2["run_dir"], "current"))
    assert int(np.asarray(state["step"])) == 8


def test_stacked_emit_matches_pairs(tmp_path):
    """emit='stacked' ships the identical data as emit='pairs' (same
    seed): one (K, ...) compact item per super-batch vs K separately
    sliced pairs — packaging only, bit-for-bit equal buffers."""
    from gcc_tpu.sampling import native
    from gcc_tpu.training.pretrain import stack_batches

    if not native.native_available():
        pytest.skip("stacked emit requires the native sampler")
    store = synthetic_corpus(str(tmp_path / "c"), num_graphs=2,
                             nodes_per_graph=400, avg_degree=6)
    scfg = SamplerConfig(rw_hops=8)
    base = PipelineConfig(batch_size=4, n_max=32, e_max=256, num_samples=32,
                          num_workers=0, super_batch=4)
    import dataclasses

    with PretrainPipeline(store, scfg, base, seed=11) as pipe:
        pairs = [next(pipe) for _ in range(4)]
        sq = stack_batches([q for q, _ in pairs])
        sk = stack_batches([k for _, k in pairs])
    with PretrainPipeline(
        store, scfg, dataclasses.replace(base, emit="stacked"), seed=11
    ) as pipe2:
        gq, gk = next(pipe2)
    for a, b in ((sq, gq), (sk, gk)):
        assert b.edges.shape == (4, pipe2.pcfg.e_tot)
        np.testing.assert_array_equal(np.asarray(a.meta), np.asarray(b.meta))
        # Compare only the live edge region per segment (tail bytes of
        # the pairs path come from sliced reused buffers, stacked path
        # from fresh np.empty — both are masked by the counts).
        for i in range(4):
            tot = int(np.asarray(a.meta)[i, 1].sum())
            np.testing.assert_array_equal(
                np.asarray(a.edges)[i, :tot], np.asarray(b.edges)[i, :tot]
            )


def test_stacked_emit_requires_fast_path(tmp_path):
    store = synthetic_corpus(str(tmp_path / "c2"), num_graphs=1,
                             nodes_per_graph=200, avg_degree=4)
    pcfg = PipelineConfig(batch_size=4, n_max=512, e_max=256,
                          num_samples=16, num_workers=0, emit="stacked")
    with pytest.raises(ValueError, match="stacked"):
        PretrainPipeline(store, SamplerConfig(rw_hops=8), pcfg)


def test_routed_emit_partitions_pairs(tmp_path):
    """emit='routed' yields size-homogeneous stacked items whose pairs
    are exactly the pairs-mode stream's pairs, regrouped by class: every
    routed (q, k) pair appears in the pairs-mode stream (same seed) with
    identical content, and every item's class tag bounds its sizes."""
    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("routed emit requires the native sampler")
    import dataclasses

    store = synthetic_corpus(str(tmp_path / "c"), num_graphs=2,
                             nodes_per_graph=400, avg_degree=8)
    scfg = SamplerConfig(rw_hops=12)
    base = PipelineConfig(batch_size=4, n_max=64, e_max=256, num_samples=256,
                          num_workers=0, super_batch=2, n_small=16)
    # Reference stream: pairs mode, same seed.
    ref_pairs = {}
    with PretrainPipeline(store, scfg, base, seed=7) as pipe:
        for _ in range(48):
            q, k = next(pipe)
            qm, km = np.asarray(q.meta), np.asarray(k.meta)
            # Reconstruct per-pair live runs from the compact layout
            # (per-graph runs concatenated in order).
            qoff = np.concatenate([[0], np.cumsum(qm[1])])
            koff = np.concatenate([[0], np.cumsum(km[1])])
            for j in range(4):
                key = (
                    int(qm[0, j]),
                    bytes(np.asarray(q.edges)[qoff[j]:qoff[j + 1]]),
                    int(km[0, j]),
                    bytes(np.asarray(k.edges)[koff[j]:koff[j + 1]]),
                )
                ref_pairs[key] = ref_pairs.get(key, 0) + 1
    routed = dataclasses.replace(base, emit="routed")
    n_small_items = n_large_items = 0
    with PretrainPipeline(store, scfg, routed, seed=7) as pipe:
        assert pipe.pcfg.e_tot_small is not None
        assert pipe.pcfg.e_tot_large is not None
        for _ in range(6):
            sq, sk = next(pipe)
            assert sq.n_max == sk.n_max and sq.n_max in (16, 64)
            e_tot_c = (pipe.pcfg.e_tot_small if sq.n_max == 16
                       else pipe.pcfg.e_tot_large)
            assert sq.edges.shape == (2, e_tot_c)
            if sq.n_max == 16:
                n_small_items += 1
            else:
                n_large_items += 1
            qm, km = np.asarray(sq.meta), np.asarray(sk.meta)
            for s in range(2):
                # Class homogeneity.
                lim = sq.n_max
                assert (qm[s, 0] <= lim).all() and (km[s, 0] <= lim).all()
                if lim == 16:
                    pass
                else:
                    assert ((qm[s, 0] > 16) | (km[s, 0] > 16)).all()
                qoff = np.concatenate([[0], np.cumsum(qm[s, 1])])
                koff = np.concatenate([[0], np.cumsum(km[s, 1])])
                for j in range(4):
                    key = (
                        int(qm[s, 0, j]),
                        bytes(np.asarray(sq.edges)[s, qoff[j]:qoff[j + 1]]),
                        int(km[s, 0, j]),
                        bytes(np.asarray(sk.edges)[s, koff[j]:koff[j + 1]]),
                    )
                    assert ref_pairs.get(key, 0) > 0, "routed pair not in pairs stream"
                    ref_pairs[key] -= 1
    assert n_small_items > 0, "no small items emitted"


def test_routed_emit_rejects_e2e_objective(tmp_path):
    """emit='routed' composes size-class-homogeneous batches — a silent
    objective change for E2E (in-batch negatives); run_pretrain refuses."""
    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("routed emit requires the native sampler")
    corpus = str(tmp_path / "c")
    synthetic_corpus(corpus, num_graphs=1, nodes_per_graph=200, avg_degree=6)
    cfg = tiny_cfg(moco=False)
    pcfg = PipelineConfig(batch_size=8, n_max=32, e_max=512, num_samples=32,
                          num_workers=0, emit="routed", n_small=16)
    with pytest.raises(ValueError, match="size-class-correlated"):
        run_pretrain(cfg, corpus, str(tmp_path / "out"), pcfg,
                     log_fn=lambda s: None, steps_per_call=4)


def test_checkpoint_structure_mismatch_readable_error(tmp_path):
    """Restoring against a different state structure (e.g. a checkpoint
    written before the flattened-optimizer change) raises a readable
    format-version error, not an opaque orbax mismatch."""
    state = {"a": np.zeros(3, np.float32), "b": {"c": np.ones(2, np.float32)}}
    path = save_checkpoint(str(tmp_path / "ck"), state, tiny_cfg())
    other = {"a": np.zeros(3, np.float32),
             "b": {"d": np.zeros((4, 4), np.float32)}}
    with pytest.raises(ValueError, match="format version"):
        load_checkpoint(path, abstract_state=other)


def test_run_pretrain_routed_end_to_end(tmp_path):
    """run_pretrain with the routed input pipeline: mixed-bucket items
    flow through one step callable (per-bucket jit cache entries), and
    metrics/checkpoints come out whole."""
    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("routed emit requires the native sampler")
    corpus = str(tmp_path / "c")
    synthetic_corpus(corpus, num_graphs=2, nodes_per_graph=300, avg_degree=6)
    cfg = tiny_cfg(moco=True)
    pcfg = PipelineConfig(batch_size=8, n_max=32, e_max=512, num_samples=64,
                          num_workers=0, emit="routed", n_small=16)
    summary = run_pretrain(cfg, corpus, str(tmp_path / "out"), pcfg,
                           log_fn=lambda s: None, steps_per_call=4)
    assert summary["steps"] == 16
    with open(os.path.join(summary["run_dir"], "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 16
    assert all(np.isfinite(l["loss"]) for l in lines)


def test_cli_generate_routes_giant_graph(tmp_path):
    """The giant-graph door end-to-end through the CLI (VERDICT r3 item
    2): `generate` on a TU dataset containing a 50k-node graph routes it
    through the partitioned whole-graph path (PE via the partitioned
    matvec + giant_gin_encode over the 8-device part mesh) while small
    graphs keep the dense entire-graph batch path — one .npy out, rows
    in dataset order. 50k nodes is ~6x beyond the measured single-chip
    dense envelope (docs/PERF.md) and beyond the reference's per-graph
    ARPACK practice."""
    from gcc_tpu import cli
    from gcc_tpu.data.tu import save_tu_dataset
    from gcc_tpu.graph.csr import CSRGraph

    corpus = str(tmp_path / "c")
    synthetic_corpus(corpus, num_graphs=2, nodes_per_graph=300, avg_degree=6)
    cfg = tiny_cfg(moco=True)
    pcfg = PipelineConfig(batch_size=8, n_max=32, e_max=512, num_samples=64,
                          num_workers=0)
    summary = run_pretrain(cfg, corpus, str(tmp_path / "out"), pcfg,
                           log_fn=lambda s: None)
    ckpt = os.path.join(summary["run_dir"], "current")

    rng = np.random.default_rng(7)
    graphs = []
    for n, davg in ((50_000, 8), (60, 6)):
        e = n * davg // 2
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        keep = src != dst
        graphs.append(CSRGraph.from_edges(src[keep], dst[keep], num_nodes=n,
                                          symmetrize=True))
    save_tu_dataset(str(tmp_path / "data"), "REDDIT-BINARY", graphs,
                    np.array([0, 1]))

    out = str(tmp_path / "emb.npy")
    cli.main(["generate", "--ckpt", ckpt, "--dataset", "rdt-b",
              "--data-root", str(tmp_path / "data"),
              "--n-max", "256", "--e-max", "2048", "--out", out])
    emb = np.load(out)
    assert emb.shape == (2, cfg.encoder.output_size)
    assert np.isfinite(emb).all()
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-3)
    # The two rows are genuinely different embeddings (not a copy bug).
    assert float(np.abs(emb[0] - emb[1]).max()) > 1e-3
