"""Multi-device parallel tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gcc_tpu.parallel import (
    make_mesh,
    partition_edges,
    partitioned_aggregate,
)
from gcc_tpu.parallel.partitioned import giant_graph_embedding_oracle


def test_make_mesh_axes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "part")
    assert mesh.devices.size == 8
    mesh2 = make_mesh(data=4, part=2)
    assert mesh2.devices.shape == (4, 2)


def test_partition_edges_static_shapes():
    src = np.arange(10)
    dst = (np.arange(10) + 1) % 10
    pg = partition_edges(src, dst, num_nodes=10, num_devices=4)
    assert pg.src.shape == (4, 3)
    assert pg.weight.sum() == 10
    assert pg.num_nodes == 12  # padded to multiple of 4


def test_partitioned_aggregate_matches_oracle():
    rng = np.random.default_rng(0)
    n, e, f, d = 64, 500, 16, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    pg = partition_edges(src, dst, num_nodes=n, num_devices=d)
    h = rng.normal(size=(pg.num_nodes, f)).astype(np.float32)

    mesh = make_mesh(data=1, part=8)
    h_sharded = jax.device_put(
        jnp.asarray(h), NamedSharding(mesh, P("part"))
    )
    out = partitioned_aggregate(pg, h_sharded, mesh)
    oracle = giant_graph_embedding_oracle(pg, h)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-4)
    # Output keeps the node sharding.
    assert out.sharding.spec == P("part")


def test_partitioned_aggregate_jits_and_grads():
    rng = np.random.default_rng(1)
    n, e, f, d = 32, 100, 8, 4
    pg = partition_edges(rng.integers(0, n, e), rng.integers(0, n, e),
                         num_nodes=n, num_devices=d)
    mesh = make_mesh(data=2, part=4)
    h = jax.device_put(
        jnp.asarray(rng.normal(size=(pg.num_nodes, f)).astype(np.float32)),
        NamedSharding(mesh, P("part")),
    )

    @jax.jit
    def loss(h):
        return (partitioned_aggregate(pg, h, mesh) ** 2).sum()

    g = jax.grad(loss)(h)
    assert np.isfinite(np.asarray(g)).all()


def test_partitioned_aggregate_dense_matches_oracle():
    """Row-block dense MXU aggregation == the segment-path numpy oracle,
    including weighted multi-edges, with the output shard never leaving
    its node sharding (no reduce-scatter exists on this path)."""
    from gcc_tpu.parallel import (partition_dense,
                                  partitioned_aggregate_dense,
                                  shard_dense_partition)

    rng = np.random.default_rng(4)
    n, e, f, d = 64, 500, 16, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.uniform(0.5, 2.0, e).astype(np.float32)
    dpg = partition_dense(src, dst, num_nodes=n, num_devices=d, weight=w)
    h = rng.normal(size=(dpg.num_nodes, f)).astype(np.float32)

    mesh = make_mesh(data=1, part=8)
    # The pre-placed sharded form (one block per device) is the
    # at-scale contract; validate through it.
    dpg = shard_dense_partition(dpg, mesh)
    assert dpg.adj.sharding.spec == P("part")
    h_sharded = jax.device_put(jnp.asarray(h),
                               NamedSharding(mesh, P("part")))
    out = partitioned_aggregate_dense(dpg, h_sharded, mesh)
    # Oracle straight from the edge list.
    oracle = np.zeros_like(h)
    np.add.at(oracle, dst, h[src] * w[:, None])
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-4)
    assert out.sharding.spec == P("part")


def test_ring_partition_buckets_cover_all_edges():
    from gcc_tpu.parallel import partition_edges_ring

    rng = np.random.default_rng(3)
    n, e, d = 50, 400, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    pg = partition_edges_ring(src, dst, num_nodes=n, num_devices=d)
    assert pg.src_local.shape[:2] == (d, d)
    assert pg.num_nodes == 52  # padded to multiple of 4
    assert pg.weight.sum() == e  # every edge lands in exactly one bucket
    rows_per = pg.num_nodes // d
    # Local ids stay inside their shard.
    assert pg.src_local.max() < rows_per and pg.dst_local.max() < rows_per


def test_ring_aggregate_matches_oracle_and_allgather_path():
    """The ring (latency-hiding) path must be numerically identical to
    the all_gather+psum_scatter path and the numpy oracle, including
    non-unit edge weights."""
    from gcc_tpu.parallel import partition_edges_ring, partitioned_aggregate_ring

    rng = np.random.default_rng(4)
    n, e, f, d = 64, 500, 16, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.uniform(0.5, 2.0, e).astype(np.float32)
    rpg = partition_edges_ring(src, dst, num_nodes=n, num_devices=d, weight=w)

    mesh = make_mesh(data=1, part=8)
    h = rng.normal(size=(rpg.num_nodes, f)).astype(np.float32)
    h_sharded = jax.device_put(jnp.asarray(h), NamedSharding(mesh, P("part")))
    out = partitioned_aggregate_ring(rpg, h_sharded, mesh)
    assert out.sharding.spec == P("part")

    oracle = np.zeros_like(h)
    np.add.at(oracle, dst, h[src] * w[:, None])
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-4)

    pg = partition_edges(src, dst, num_nodes=n, num_devices=d)
    # partition_edges is unweighted; compare on the unit-weight graph.
    rpg1 = partition_edges_ring(src, dst, num_nodes=n, num_devices=d)
    out_ring = partitioned_aggregate_ring(rpg1, h_sharded, mesh)
    out_ag = partitioned_aggregate(pg, h_sharded, mesh)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_ag),
                               atol=1e-4)


def test_ring_aggregate_jits_and_grads():
    from gcc_tpu.parallel import partition_edges_ring, partitioned_aggregate_ring

    rng = np.random.default_rng(5)
    n, e, f = 32, 100, 8
    rpg = partition_edges_ring(rng.integers(0, n, e), rng.integers(0, n, e),
                               num_nodes=n, num_devices=4)
    mesh = make_mesh(data=2, part=4)
    h = jax.device_put(
        jnp.asarray(rng.normal(size=(rpg.num_nodes, f)).astype(np.float32)),
        NamedSharding(mesh, P("part")),
    )

    @jax.jit
    def loss(h):
        return (partitioned_aggregate_ring(rpg, h, mesh) ** 2).sum()

    g = jax.grad(loss)(h)
    assert np.isfinite(np.asarray(g)).all()
    # Gradient of sum-of-squares: 2 * Aᵀ(A h); check against oracle.
    A = np.zeros((rpg.num_nodes, rpg.num_nodes), np.float32)
    for dd in range(4):
        for oo in range(4):
            rows = rpg.num_nodes // 4
            for s, t, wgt in zip(rpg.src_local[dd, oo],
                                 rpg.dst_local[dd, oo],
                                 rpg.weight[dd, oo]):
                A[dd * rows + t, oo * rows + s] += wgt
    hn = np.asarray(h)
    np.testing.assert_allclose(np.asarray(g), 2 * A.T @ (A @ hn), atol=1e-3)


def test_dp_train_step_matches_single_device():
    """The DP-sharded step must compute the same loss as unsharded."""
    from gcc_tpu.config import (
        ContrastConfig, EncoderConfig, OptimConfig, SamplerConfig, TrainConfig,
    )
    from gcc_tpu.graph.csr import CSRGraph
    from gcc_tpu.sampling.pipeline import PipelineConfig, ShardSampler
    from gcc_tpu.graph.corpus import CorpusStore, synthetic_corpus
    from gcc_tpu.training import create_pretrain_state, make_train_step
    from gcc_tpu.parallel.data_parallel import (
        make_dp_train_step, shard_batch, shard_state,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        store = synthetic_corpus(td + "/c", num_graphs=1,
                                 nodes_per_graph=300, avg_degree=6)
        cfg = TrainConfig(
            batch_size=8,
            sampler=SamplerConfig(rw_hops=8),
            encoder=EncoderConfig(hidden_size=16, output_size=16,
                                  positional_embedding_size=8,
                                  degree_embedding_size=4,
                                  pe_method="eigh"),
            contrast=ContrastConfig(moco=True, nce_k=64),
            optim=OptimConfig(learning_rate=0.01),
        )
        # DP shards the batch dim of every wire leaf — needs the padded
        # (B, E_max) wire layout, not the flat compact one.
        pcfg = PipelineConfig(batch_size=8, n_max=16, e_max=128,
                              num_workers=0, super_batch=1,
                              compact_wire=False)
        shard = ShardSampler(store, [0], cfg.sampler, pcfg, seed=0)
        bq, bk = shard.next_pair()

        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg, bq, total_steps=10, n_max=16)
        single = make_train_step(cfg, enc, tx, n_max=16)
        s1, m1 = single(state, bq, bk)

        # Fresh state (same rng) on the mesh.
        state2, enc2, tx2 = create_pretrain_state(
            jax.random.PRNGKey(0), cfg, bq, total_steps=10, n_max=16)
        mesh = make_mesh(data=8, part=1)
        state2 = shard_state(mesh, state2)
        dp = make_dp_train_step(cfg, enc2, tx2, mesh, n_max=16)
        s2, m2 = dp(state2, shard_batch(mesh, bq), shard_batch(mesh, bk))

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-4)
        # Queue stays sharded over data.
        assert s2.queue.memory.sharding.spec in (P("data"), P("data",))
        # Sharded-enqueue determinism: the ring buffer's contents match
        # the single-device run exactly (same write order and indices).
        np.testing.assert_allclose(
            np.asarray(s2.queue.memory), np.asarray(s1.queue.memory),
            atol=1e-5,
        )
        assert int(np.asarray(s2.queue.index)) == int(np.asarray(s1.queue.index))


def test_batched_partitioned_aggregate_matches_oracle():
    """partitioned_aggregate_batched on the combined (data=4, part=2)
    mesh: a batch of feature views of one shared partitioned graph,
    batch over "data", node rows over "part" — per-view results must
    equal the single-view oracle."""
    from gcc_tpu.parallel import partitioned_aggregate_batched

    rng = np.random.default_rng(6)
    n, e, f, b = 32, 200, 8, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    pg = partition_edges(src, dst, num_nodes=n, num_devices=2)
    h = rng.normal(size=(b, pg.num_nodes, f)).astype(np.float32)

    mesh = make_mesh(data=4, part=2)
    h_sharded = jax.device_put(
        jnp.asarray(h), NamedSharding(mesh, P("data", "part"))
    )
    out = partitioned_aggregate_batched(pg, h_sharded, mesh)
    assert out.sharding.spec == P("data", "part")
    out = np.asarray(out)
    for i in range(b):
        np.testing.assert_allclose(out[i],
                                   giant_graph_embedding_oracle(pg, h[i]),
                                   atol=1e-4)


def test_combined_data_part_mesh():
    """SURVEY.md §7 stage 7 / VERDICT r2 item 4: ONE jitted program on
    the combined (data=4, part=2) mesh takes a DP training step (batch
    sharded over "data") while a giant-graph partitioned aggregation
    runs over "part". The training loss must equal the data-only-mesh
    DP step and the aggregation must equal the numpy oracle."""
    from gcc_tpu.config import (
        ContrastConfig, EncoderConfig, OptimConfig, SamplerConfig,
        TrainConfig,
    )
    from gcc_tpu.graph.corpus import synthetic_corpus
    from gcc_tpu.parallel.data_parallel import (
        make_combined_train_step, make_dp_train_step, shard_batch,
        shard_state,
    )
    from gcc_tpu.sampling.pipeline import PipelineConfig, ShardSampler
    from gcc_tpu.training import create_pretrain_state
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        store = synthetic_corpus(td + "/c", num_graphs=1,
                                 nodes_per_graph=300, avg_degree=6)
        cfg = TrainConfig(
            batch_size=8,
            sampler=SamplerConfig(rw_hops=8),
            encoder=EncoderConfig(hidden_size=16, output_size=16,
                                  positional_embedding_size=8,
                                  degree_embedding_size=4,
                                  pe_method="eigh"),
            contrast=ContrastConfig(moco=True, nce_k=64),
            optim=OptimConfig(learning_rate=0.01),
        )
        pcfg = PipelineConfig(batch_size=8, n_max=16, e_max=128,
                              num_workers=0, super_batch=1,
                              compact_wire=False)
        shard = ShardSampler(store, [0], cfg.sampler, pcfg, seed=0)
        bq, bk = shard.next_pair()

        # Giant graph riding the part axis of the same mesh.
        rng = np.random.default_rng(7)
        gn, ge, gf = 32, 200, 8
        pg = partition_edges(rng.integers(0, gn, ge),
                             rng.integers(0, gn, ge),
                             num_nodes=gn, num_devices=2)
        h = rng.normal(size=(pg.num_nodes, gf)).astype(np.float32)

        mesh = make_mesh(data=4, part=2)
        state, enc, tx = create_pretrain_state(
            jax.random.PRNGKey(0), cfg, bq, total_steps=10, n_max=16)
        state = shard_state(mesh, state)
        step = make_combined_train_step(cfg, enc, tx, mesh, pg, n_max=16)
        h_sharded = jax.device_put(jnp.asarray(h),
                                   NamedSharding(mesh, P("part")))
        new_state, metrics, agg = step(
            state, shard_batch(mesh, bq), shard_batch(mesh, bk), h_sharded)
        loss = float(np.asarray(metrics["loss"]))
        assert np.isfinite(loss)
        np.testing.assert_allclose(np.asarray(agg),
                                   giant_graph_embedding_oracle(pg, h),
                                   atol=1e-4)
        # The combined-mesh loss matches a data-only-mesh DP step.
        state2, enc2, tx2 = create_pretrain_state(
            jax.random.PRNGKey(0), cfg, bq, total_steps=10, n_max=16)
        mesh_d = make_mesh(data=8, part=1)
        state2 = shard_state(mesh_d, state2)
        dp = make_dp_train_step(cfg, enc2, tx2, mesh_d, n_max=16)
        _, m2 = dp(state2, shard_batch(mesh_d, bq), shard_batch(mesh_d, bk))
        np.testing.assert_allclose(loss, float(np.asarray(m2["loss"])),
                                   rtol=1e-4)


def test_giant_gin_matches_dense_path():
    """Whole-graph encoding via the partitioned path must equal the dense
    single-chip path, using the same pretrained params."""
    from gcc_tpu.config import EncoderConfig
    from gcc_tpu.features import featurize_batch
    from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
    from gcc_tpu.models import GraphEncoder
    from gcc_tpu.parallel.giant import giant_gin_encode

    rng = np.random.default_rng(0)
    n = 24
    src = rng.integers(0, n, 80)
    dst = rng.integers(0, n, 80)
    keep = src != dst
    s = np.concatenate([src[keep], dst[keep]]).astype(np.int32)
    d = np.concatenate([dst[keep], src[keep]]).astype(np.int32)
    cfg = EncoderConfig(hidden_size=16, output_size=16,
                        positional_embedding_size=8,
                        degree_embedding_size=4, pe_method="eigh",
                        final_dropout=0.0)

    batch = batch_subgraphs([Subgraph(src=s, dst=d, num_nodes=n, seed=3)],
                            n_max=32, e_max=256)
    feats = featurize_batch(batch, cfg.positional_embedding_size)
    enc = GraphEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    dense_out = np.asarray(enc.apply(variables, feats, train=False))[0]

    # Rebuild the same node features for the partitioned path (padded to
    # the partition's node count).
    d_dev = 8
    pg = partition_edges(s, d, num_nodes=n, num_devices=d_dev)
    pos = np.asarray(feats.pos)[0]                       # (32, 8)
    deg = np.asarray(feats.degrees)[0]
    seedf = np.asarray(feats.seed_flag)[0]
    table = np.asarray(
        variables["params"]["DegreeEmbedding_0"]["embedding"])
    nf = np.concatenate(
        [pos, table[np.clip(deg, 0, cfg.max_degree)], seedf[:, None]],
        axis=-1).astype(np.float32)
    mask = np.asarray(feats.node_mask)[0]
    # Trim/pad to pg.num_nodes.
    nf = nf[: pg.num_nodes]
    mask = mask[: pg.num_nodes]

    mesh = make_mesh(data=1, part=8)
    from jax.sharding import NamedSharding

    h = jax.device_put(jnp.asarray(nf), NamedSharding(mesh, P("part")))
    m = jax.device_put(jnp.asarray(mask), NamedSharding(mesh, P("part")))
    giant_out = np.asarray(giant_gin_encode(
        variables["params"], variables["batch_stats"], pg, h, m, mesh,
        num_layers=cfg.num_layers,
    ))
    np.testing.assert_allclose(giant_out, dense_out, atol=2e-4)

    # Ring (latency-hiding) aggregation: same encoder, same result.
    from gcc_tpu.parallel import partition_edges_ring

    rpg = partition_edges_ring(s, d, num_nodes=n, num_devices=d_dev)
    assert rpg.num_nodes == pg.num_nodes
    ring_out = np.asarray(giant_gin_encode(
        variables["params"], variables["batch_stats"], rpg, h, m, mesh,
        num_layers=cfg.num_layers,
    ))
    np.testing.assert_allclose(ring_out, dense_out, atol=2e-4)

    # Dense row-block aggregation (the measured-preferred shard-local
    # form, docs/PERF.md "Partitioned aggregation"): same result again.
    from gcc_tpu.parallel import partition_dense

    dpg = partition_dense(s, d, num_nodes=n, num_devices=d_dev)
    assert dpg.num_nodes == pg.num_nodes
    dense_pg_out = np.asarray(giant_gin_encode(
        variables["params"], variables["batch_stats"], dpg, h, m, mesh,
        num_layers=cfg.num_layers,
    ))
    np.testing.assert_allclose(dense_pg_out, dense_out, atol=2e-4)


def test_run_pretrain_dp_matches_single_device(tmp_path):
    """The PRODUCTION path under data parallelism: run_pretrain with
    dp_devices=4 (stacked compact wire with a sharded device axis,
    packed state, K-step scan) must reproduce the single-device loss
    trajectory step for step — same sampling content, same math, only
    reduction order differs (VERDICT r1 item 1)."""
    import json
    import os

    from gcc_tpu.config import (
        ContrastConfig, EncoderConfig, OptimConfig, SamplerConfig,
        TrainConfig,
    )
    from gcc_tpu.graph.corpus import synthetic_corpus
    from gcc_tpu.sampling import native
    from gcc_tpu.sampling.pipeline import PipelineConfig
    from gcc_tpu.training.loop import run_pretrain

    if not native.native_available():
        pytest.skip("stacked emit requires the native sampler")

    corpus = str(tmp_path / "c")
    synthetic_corpus(corpus, num_graphs=2, nodes_per_graph=300,
                     avg_degree=6)
    cfg = TrainConfig(
        batch_size=8, epochs=2, num_samples=32, num_workers=0,
        sampler=SamplerConfig(rw_hops=8),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=True, nce_k=32),
        optim=OptimConfig(learning_rate=0.01),
    )

    def pcfg(e_tot):
        # Explicit hard-cap e_tot on both sides: no truncation anywhere,
        # so single and DP runs ship bit-identical edge content.
        return PipelineConfig(batch_size=8, n_max=32, e_max=256,
                              num_samples=32, num_workers=0,
                              emit="stacked", e_tot=e_tot)

    s1 = run_pretrain(cfg, corpus, str(tmp_path / "o1"), pcfg(8 * 256),
                      log_fn=lambda s: None, steps_per_call=4)
    s4 = run_pretrain(cfg, corpus, str(tmp_path / "o4"), pcfg(2 * 256),
                      log_fn=lambda s: None, steps_per_call=4,
                      dp_devices=4)

    def losses(summary):
        with open(os.path.join(summary["run_dir"], "metrics.jsonl")) as f:
            return np.array([json.loads(l)["loss"] for l in f])

    l1, l4 = losses(s1), losses(s4)
    assert len(l1) == len(l4) == 8
    np.testing.assert_allclose(l4, l1, rtol=5e-4, atol=1e-5)


def test_run_pretrain_dp_routed(tmp_path):
    """Routed emission under DP: per-bucket items with a sharded device
    axis flow through the same step callable and train to finite loss."""
    import json
    import os

    from gcc_tpu.config import (
        ContrastConfig, EncoderConfig, OptimConfig, SamplerConfig,
        TrainConfig,
    )
    from gcc_tpu.graph.corpus import synthetic_corpus
    from gcc_tpu.sampling import native
    from gcc_tpu.sampling.pipeline import PipelineConfig
    from gcc_tpu.training.loop import run_pretrain

    if not native.native_available():
        pytest.skip("routed emit requires the native sampler")

    corpus = str(tmp_path / "c")
    synthetic_corpus(corpus, num_graphs=2, nodes_per_graph=300,
                     avg_degree=6)
    cfg = TrainConfig(
        batch_size=8, epochs=1, num_samples=64, num_workers=0,
        sampler=SamplerConfig(rw_hops=8),
        encoder=EncoderConfig(hidden_size=16, output_size=16,
                              positional_embedding_size=8,
                              degree_embedding_size=4, pe_method="eigh"),
        contrast=ContrastConfig(moco=True, nce_k=32),
        optim=OptimConfig(learning_rate=0.01),
    )
    pcfg = PipelineConfig(batch_size=8, n_max=32, e_max=256,
                          num_samples=64, num_workers=0, emit="routed",
                          n_small=16)
    summary = run_pretrain(cfg, corpus, str(tmp_path / "out"), pcfg,
                           log_fn=lambda s: None, steps_per_call=4,
                           dp_devices=2)
    assert summary["steps"] == 8
    with open(os.path.join(summary["run_dir"], "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 8
    assert all(np.isfinite(l["loss"]) for l in lines)


def test_two_process_distributed_dp_step(tmp_path):
    """REAL multi-process jax.distributed (SURVEY.md §4 "fake multi-host"):
    two OS processes × 4 virtual CPU devices each initialize_multihost,
    build the global 8-device mesh, assemble the global batch from
    host-local halves via host_local_batch_to_global, and take one DP
    step whose loss matches a single-process reference."""
    import json
    import os
    import socket
    import subprocess
    import sys

    child = os.path.join(os.path.dirname(__file__), "distributed_child.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), coordinator],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"child failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert all(o["devices"] == 8 and o["local"] == 4 for o in outs)
    # Both controllers of the multi-process run computed the same step.
    np.testing.assert_allclose(outs[0]["loss"], outs[1]["loss"], rtol=1e-6)

    # Single-process reference on this process's 8 in-process devices.
    import importlib

    sys.path.insert(0, os.path.dirname(__file__))
    child_mod = importlib.import_module("distributed_child")
    from gcc_tpu.training import make_train_step

    cfg, state, enc, tx, bq, bk = child_mod.build_state_and_step()
    step = make_train_step(cfg, enc, tx, n_max=16)
    _, m_ref = step(state, bq, bk)
    np.testing.assert_allclose(outs[0]["loss"],
                               float(np.asarray(m_ref["loss"])), rtol=5e-4)


def test_two_process_run_pretrain(tmp_path):
    """PRODUCTION multi-process loop (VERDICT r2 weak #5): two OS
    processes x 4 virtual CPU devices run the full run_pretrain —
    per-host corpus shards, stacked compact wire with a local device
    axis, make_array_from_process_local_data batch assembly, explicit
    e_tot, process-0-only writes. Both processes must report identical
    global losses (loss is a psum collective), and process 0 must have
    written metrics + a checkpoint."""
    import json
    import os
    import socket
    import subprocess
    import sys

    from gcc_tpu.sampling import native

    if not native.native_available():
        pytest.skip("stacked emit requires the native sampler")

    from gcc_tpu.graph.corpus import synthetic_corpus

    corpus = str(tmp_path / "corpus")
    # >= 2 graphs so each host's greedy shard is non-empty.
    synthetic_corpus(corpus, num_graphs=4, nodes_per_graph=300,
                     avg_degree=6)

    child = os.path.join(os.path.dirname(__file__),
                         "distributed_pretrain_child.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    out_dir = str(tmp_path / "out")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), coordinator, corpus, out_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"child failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert outs[0]["steps"] == outs[1]["steps"] == 8
    # The loss is computed by global collectives: every controller of
    # the multi-process program must see the same value.
    np.testing.assert_allclose(outs[0]["avg_loss"], outs[1]["avg_loss"],
                               rtol=1e-6)
    assert np.isfinite(outs[0]["avg_loss"])

    run_dir = outs[0]["run_dir"]
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 8
    assert all(np.isfinite(l["loss"]) for l in lines)
    assert os.path.isdir(os.path.join(run_dir, "current"))  # checkpoint


def _random_symmetric_graph(n, avg_deg, seed=0):
    rng = np.random.default_rng(seed)
    e = n * avg_deg // 2
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    return (np.concatenate([src, dst]).astype(np.int64),
            np.concatenate([dst, src]).astype(np.int64))


@pytest.mark.parametrize("schedule", ["dense", "ring"])
def test_giant_pe_matches_exact_eigh(schedule):
    """Whole-graph partitioned PE (giant_features.giant_laplacian_pe) vs
    the exact dense eigendecomposition of M = D^-1/2 A D^-1/2 — the
    down-sampled oracle for the giant path (VERDICT r3 item 3). Checks
    gap-separated columns only: clustered-spectrum mixing is the same
    ambiguity the reference's ARPACK has (positional.py docstring)."""
    from gcc_tpu.parallel.partitioned import (
        partition_dense, partition_edges_ring, shard_dense_partition,
    )
    from gcc_tpu.parallel.giant_features import (
        giant_laplacian_pe, giant_pe_basis, normalized_edge_weights,
        pg_arrays, pg_rebuild,
    )

    n, d_cnt, pos = 500, 8, 32
    src, dst = _random_symmetric_graph(n, 10)
    deg = np.bincount(src, minlength=n)
    w = normalized_edge_weights(src, dst, deg)
    mesh = make_mesh(data=1, part=d_cnt)
    if schedule == "dense":
        pg = shard_dense_partition(
            partition_dense(src, dst, n, d_cnt, weight=w), mesh)
    else:
        from gcc_tpu.parallel.partitioned import partition_edges_ring

        pg = partition_edges_ring(src, dst, n, d_cnt, weight=w)
    n_pad = pg.num_nodes
    q0 = giant_pe_basis(n_pad, n, pos, guards=16)
    mask = np.zeros(n_pad, np.float32)
    mask[:n] = 1.0
    sh = NamedSharding(mesh, P("part"))
    pa = pg_arrays(pg)
    pe = jax.jit(
        lambda pa, q, m: giant_laplacian_pe(
            pg_rebuild(pg, pa), q, m, mesh, num_real_nodes=n,
            pos_size=pos, iters=64)
    )(pa, jax.device_put(q0, sh), jax.device_put(mask, sh))
    pe = np.asarray(pe)
    assert pe.shape == (n_pad, pos)
    assert np.isfinite(pe).all()
    assert np.abs(pe[n:]).max() == 0.0  # padding rows zero

    # Exact oracle (same conventions: descending order, max-|entry| sign,
    # row-L2 normalization).
    m_dense = np.zeros((n, n))
    inv = 1.0 / np.sqrt(np.maximum(deg, 1))
    np.add.at(m_dense, (dst, src), inv[src] * inv[dst])
    evals, evecs = np.linalg.eigh(m_dense)
    evals, evecs = evals[::-1], evecs[:, ::-1]
    top = evecs[:, :pos]
    ref = np.sum(np.where(np.abs(top) == np.abs(top).max(0, keepdims=True),
                          top, 0.0), axis=0, keepdims=True)
    top = top * np.sign(np.where(ref == 0, 1.0, ref))
    rn = np.linalg.norm(top, axis=1, keepdims=True)
    top = top / np.where(rn == 0, 1.0, rn)
    cos = np.abs(
        (pe[:n] * top).sum(0)
        / (np.linalg.norm(pe[:n], axis=0) * np.linalg.norm(top, axis=0)
           + 1e-12))
    gaps = np.minimum(np.abs(np.diff(evals))[:pos],
                      np.abs(np.diff(evals))[1:pos + 1])
    sep = gaps > 1e-3
    assert sep.sum() >= 10  # the oracle actually discriminates
    assert np.median(cos[sep]) > 0.98, cos.round(3)
    assert np.median(cos[:8]) > 0.99, cos[:8].round(4)


def test_generate_graph_embeddings_routes_giant(tmp_path):
    """generate_graph_embeddings routes graphs beyond n_max to the
    partitioned giant path and keeps row order; small graphs match the
    dense entire-graph batch path exactly."""
    from gcc_tpu.config import TrainConfig
    from gcc_tpu.features import featurize_batch
    from gcc_tpu.generate import (
        generate_embeddings, generate_graph_embeddings, graph_subgraphs,
    )
    from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
    from gcc_tpu.graph.csr import CSRGraph
    from gcc_tpu.models import GraphEncoder
    from types import SimpleNamespace

    cfg = TrainConfig()
    enc = GraphEncoder(cfg.encoder)
    rng = np.random.default_rng(0)
    s = rng.integers(0, 24, 96).astype(np.int32)
    d = rng.integers(0, 24, 96).astype(np.int32)
    toy = batch_subgraphs([Subgraph(src=s, dst=d, num_nodes=24)],
                          n_max=32, e_max=256)
    feats = jax.jit(
        lambda b: featurize_batch(b, cfg.encoder.positional_embedding_size)
    )(toy)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    state = SimpleNamespace(params=variables["params"],
                            batch_stats=variables["batch_stats"])

    graphs = []
    for n, davg in ((60, 6), (2000, 8), (50, 4)):
        src, dst = _random_symmetric_graph(n, davg, seed=n)
        graphs.append(CSRGraph.from_edges(src, dst, num_nodes=n,
                                          symmetrize=True))
    emb = generate_graph_embeddings(cfg, state, graphs, n_max=256,
                                    e_max=2048, giant_iters=32)
    assert emb.shape == (3, cfg.encoder.output_size)
    assert np.isfinite(emb).all()
    # Every row L2-normalized (cfg.norm default).
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-3)
    # Small rows == the dense entire-graph path, in the original order.
    small = [graphs[0], graphs[2]]
    direct = generate_embeddings(cfg, state, graph_subgraphs(small),
                                 n_max=256, e_max=2048)
    np.testing.assert_allclose(emb[[0, 2]], direct, atol=1e-5)


def test_giant_embedding_program_cache_reuse():
    """Two giant graphs whose padded shapes land in the same bucket must
    REUSE the cached compiled programs (each fresh jit closure would
    recompile — ~20s per graph through a remote relay), and both produce
    valid unit-norm embeddings."""
    from gcc_tpu.config import EncoderConfig
    from gcc_tpu.features import featurize_batch
    from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
    from gcc_tpu.graph.csr import CSRGraph
    from gcc_tpu.models import GraphEncoder
    from gcc_tpu.parallel import giant_features as gf

    cfg = EncoderConfig()
    enc = GraphEncoder(cfg)
    rng = np.random.default_rng(0)
    s = rng.integers(0, 24, 96).astype(np.int32)
    d = rng.integers(0, 24, 96).astype(np.int32)
    toy = batch_subgraphs([Subgraph(src=s, dst=d, num_nodes=24)],
                          n_max=32, e_max=256)
    feats = jax.jit(
        lambda b: featurize_batch(b, cfg.positional_embedding_size))(toy)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    mesh = make_mesh(data=1, part=8)

    gf._giant_pe_fn.cache_clear()
    gf._giant_enc_fn.cache_clear()
    embs = []
    for n in (9000, 9400):  # same 256*8-node bucket (10240)
        src, dst = _random_symmetric_graph(n, 6, seed=n)
        g = CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True)
        embs.append(gf.giant_graph_embedding(
            cfg, variables["params"], variables["batch_stats"], g, mesh,
            iters=16))
    for e in embs:
        assert np.isfinite(e).all()
        np.testing.assert_allclose(np.linalg.norm(e), 1.0, atol=1e-3)
    assert float(np.abs(embs[0] - embs[1]).max()) > 1e-4
    # Second graph hit the caches (same padded bucket + ring width).
    assert gf._giant_pe_fn.cache_info().hits >= 1, \
        gf._giant_pe_fn.cache_info()
    assert gf._giant_enc_fn.cache_info().hits >= 1


def test_generate_graph_embeddings_composite_readout(tmp_path):
    """readout='composite' returns the inmean+convl2 composition with
    the documented block structure (generate.composite_graph_readout)
    and refuses giant graphs (no per-layer pooled outputs there)."""
    from types import SimpleNamespace

    import pytest

    from gcc_tpu.config import TrainConfig
    from gcc_tpu.features import featurize_batch
    from gcc_tpu.generate import generate_graph_embeddings
    from gcc_tpu.graph.batch import Subgraph, batch_subgraphs
    from gcc_tpu.graph.csr import CSRGraph
    from gcc_tpu.models import GraphEncoder

    cfg = TrainConfig()
    enc = GraphEncoder(cfg.encoder)
    rng = np.random.default_rng(0)
    s = rng.integers(0, 24, 96).astype(np.int32)
    d = rng.integers(0, 24, 96).astype(np.int32)
    toy = batch_subgraphs([Subgraph(src=s, dst=d, num_nodes=24)],
                          n_max=32, e_max=256)
    feats = jax.jit(
        lambda b: featurize_batch(b, cfg.encoder.positional_embedding_size)
    )(toy)
    variables = enc.init(jax.random.PRNGKey(0), feats, train=False)
    state = SimpleNamespace(params=variables["params"],
                            batch_stats=variables["batch_stats"])

    graphs = []
    for n, davg in ((60, 6), (50, 4)):
        src, dst = _random_symmetric_graph(n, davg, seed=n)
        graphs.append(CSRGraph.from_edges(src, dst, num_nodes=n,
                                          symmetrize=True))
    emb = generate_graph_embeddings(cfg, state, graphs, n_max=128,
                                    e_max=1024, readout="composite")
    e = cfg.encoder
    in_dim = e.positional_embedding_size + e.degree_embedding_size + 1
    want = in_dim + (e.num_layers - 1) * e.hidden_size
    assert emb.shape == (2, want)
    assert np.isfinite(emb).all()
    # conv blocks are L2-normalized per layer; input block is mean-pooled
    conv0 = emb[:, in_dim : in_dim + e.hidden_size]
    np.testing.assert_allclose(np.linalg.norm(conv0, axis=1), 1.0,
                               atol=1e-4)
    big_src, big_dst = _random_symmetric_graph(600, 6, seed=7)
    giant = CSRGraph.from_edges(big_src, big_dst, num_nodes=600,
                                symmetrize=True)
    with pytest.raises(NotImplementedError):
        generate_graph_embeddings(cfg, state, graphs + [giant], n_max=128,
                                  e_max=1024, readout="composite")
