"""Coverage for auxiliary subsystems: meters, profiling, multihost helpers,
checkpoint config, CLI parsing."""

import json
import os

import numpy as np
import pytest

from gcc_tpu.config import TrainConfig
from gcc_tpu.utils.meters import AverageMeter
from gcc_tpu.utils.profiling import TensorBoardWriter, maybe_profile


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.val == 4.0
    assert m.count == 4
    np.testing.assert_allclose(m.avg, (2 + 12) / 4)
    m.reset()
    assert m.count == 0


def test_maybe_profile_noop():
    with maybe_profile(None):
        x = 1 + 1
    assert x == 2


def test_tensorboard_writer_disabled_and_enabled(tmp_path):
    w = TensorBoardWriter(None)
    w.scalar("a", 1.0, 0)  # no-op, no crash
    w.close()
    w2 = TensorBoardWriter(str(tmp_path / "tb"))
    w2.scalar("a", 1.0, 0)
    w2.close()


def test_corpus_shard_for_host():
    from gcc_tpu.parallel.multihost import corpus_shard_for_host

    sizes = [100, 90, 10, 5]
    s0 = corpus_shard_for_host(sizes, num_hosts=2, host_id=0)
    s1 = corpus_shard_for_host(sizes, num_hosts=2, host_id=1)
    assert sorted(s0 + s1) == [0, 1, 2, 3]
    assert 0 in s0  # biggest graph to first (least-loaded) host


def test_host_local_batch_to_global():
    import jax

    from gcc_tpu.parallel import make_mesh
    from gcc_tpu.parallel.multihost import host_local_batch_to_global

    mesh = make_mesh(data=8, part=1)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    out = host_local_batch_to_global(mesh, batch)
    assert out["x"].shape == (16, 1)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_initialize_multihost_noop():
    from gcc_tpu.parallel.multihost import initialize_multihost

    initialize_multihost()  # single-host: must be a no-op


def test_cli_parses_all_subcommands(capsys):
    # argparse wiring only: --help for each subcommand must not crash.
    from gcc_tpu import cli

    for sub in ["synth-corpus", "ingest", "pretrain", "finetune",
                "generate", "eval-node", "eval-graph", "eval-sim"]:
        with pytest.raises(SystemExit) as e:
            cli.main([sub, "--help"])
        assert e.value.code == 0
        capsys.readouterr()


def test_config_json_sidecar_roundtrip(tmp_path):
    from gcc_tpu.training.checkpoint import CONFIG_FILE, load_config

    cfg = TrainConfig(batch_size=7, exp="x")
    with open(os.path.join(tmp_path, CONFIG_FILE), "w") as f:
        f.write(cfg.to_json())
    cfg2 = load_config(str(tmp_path))
    assert cfg2 == cfg


def test_ingest_edgelists_roundtrip(tmp_path):
    """The x2dgl-equivalent ingest (reference gcc/utils/x2dgl.py:28-131):
    dedup + self-loop removal + largest-CC + size-desc ordering, through
    a corpus that the pipeline can sample from."""
    import numpy as np

    from gcc_tpu.data.ingest import ingest_edgelists
    from gcc_tpu.graph.corpus import CorpusStore

    # Graph A: a 5-clique with raw (non-dense) node ids, duplicate edges,
    # a self loop, and a detached 2-node component that must be dropped.
    a = tmp_path / "a.edgelist"
    lines = []
    ids = [10, 20, 30, 40, 50]
    for i in range(5):
        for j in range(i + 1, 5):
            lines.append(f"{ids[i]} {ids[j]}")
            lines.append(f"{ids[j]} {ids[i]}")  # duplicate (reverse)
    lines.append("10 10")      # self loop
    lines.append("900 901")    # detached component (smaller CC)
    a.write_text("\n".join(lines) + "\n")
    # Graph B: a 3-path (smaller than A, so it must sort second).
    b = tmp_path / "b.edgelist"
    b.write_text("1 2\n2 3\n")

    ingest_edgelists([str(b), str(a)], str(tmp_path / "corpus"))
    store = CorpusStore.open(str(tmp_path / "corpus"))
    assert store.num_graphs == 2
    assert list(store.graph_sizes) == sorted(store.graph_sizes,
                                             reverse=True)
    g0 = store.load(0)  # largest first: the clique's 5-node CC
    assert g0.num_nodes == 5
    deg = np.diff(np.asarray(g0.indptr))
    assert (deg == 4).all()            # clean 5-clique: dedup worked
    assert g0.num_edges == 20          # 5*4 directed, no self loops
    g1 = store.load(1)
    assert g1.num_nodes == 3 and g1.num_edges == 4


def test_checkpoint_v2_restore_fills_nce_z(tmp_path):
    """A v2 checkpoint (no nce_z leaf) restores against the v3 abstract
    state with nce_z filled to its -1.0 default instead of erroring
    (checkpoint.py load_checkpoint v2->v3 compatibility)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from gcc_tpu.training.checkpoint import load_checkpoint

    v2_state = {"params": {"w": np.ones((3,), np.float32)},
                "step": np.int32(7)}
    target = str(tmp_path / "ckpt_v2")
    ocp.PyTreeCheckpointer().save(target, v2_state)

    abstract = {"params": {"w": np.zeros((3,), np.float32)},
                "step": np.int32(0),
                "nce_z": jnp.full((), 0.0, jnp.float32)}
    restored = load_checkpoint(target, abstract_state=abstract)
    assert float(restored["nce_z"]) == -1.0
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  v2_state["params"]["w"])
    assert int(restored["step"]) == 7


def test_config_sidecar_tolerates_unknown_fields():
    """A config.json written by an older build (fields since renamed or
    removed) must still load: unknown nested keys are dropped
    (config._from_dict), so checkpoints survive config evolution."""
    import json

    from gcc_tpu.config import TrainConfig

    d = json.loads(TrainConfig().to_json())
    d["contrast"]["e2e_split_small"] = 240      # removed in round 4
    d["contrast"]["some_future_field"] = "x"
    d["retired_top_level"] = 1
    cfg = TrainConfig.from_json(json.dumps(d))
    assert cfg.contrast.nce_t == TrainConfig().contrast.nce_t
