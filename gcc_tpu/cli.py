"""Command-line interface.

Subcommands mirror the reference's entry points (train.py / generate.py /
gcc/tasks/*.py CLIs plus the x2dgl ingest tool):

  python -m gcc_tpu.cli synth-corpus --out data/corpus
  python -m gcc_tpu.cli ingest --out data/corpus graph1.edgelist ...
  python -m gcc_tpu.cli pretrain --corpus data/corpus --out saved [--moco ...]
  python -m gcc_tpu.cli generate --ckpt saved/<run>/current --dataset usa_airport
  python -m gcc_tpu.cli eval-node --dataset usa_airport --emb <npy>
  python -m gcc_tpu.cli eval-graph --dataset imdb-binary --emb <npy>
  python -m gcc_tpu.cli eval-sim --dataset kdd_icdm --emb1 <npy> --emb2 <npy>
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np


def _enable_compilation_cache():
    """Persistent XLA compilation cache: remote-TPU compiles run minutes;
    cache them across processes."""
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/gcc_tpu_xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _add_train_flags(p):
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--num-samples", type=int, default=2000)
    p.add_argument("--num-workers", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--moco", action="store_true")
    p.add_argument("--nce-k", type=int, default=16384)
    p.add_argument("--nce-t", type=float, default=0.07)
    p.add_argument("--alpha", type=float, default=0.999)
    p.add_argument("--learning-rate", type=float, default=0.005)
    p.add_argument("--weight-decay", type=float, default=1e-5)
    p.add_argument("--model", default="gin", choices=["gin", "gat", "mpnn"])
    p.add_argument("--num-layer", type=int, default=5)
    p.add_argument("--hidden-size", type=int, default=64)
    p.add_argument("--rw-hops", type=int, default=256)
    p.add_argument("--restart-prob", type=float, default=0.8)
    p.add_argument("--positional-embedding-size", type=int, default=32)
    p.add_argument("--degree-embedding-size", type=int, default=16)
    p.add_argument("--max-degree", type=int, default=512)
    p.add_argument("--pe-method", default="subspace", choices=["subspace", "eigh"])
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "sgd", "adagrad"])
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--momentum", type=float, default=0.9, help="sgd only")
    p.add_argument("--clip-norm", type=float, default=1.0)
    p.add_argument("--no-norm", action="store_true",
                   help="skip final L2-normalization of embeddings")
    p.add_argument("--set2set-iter", type=int, default=6)
    p.add_argument("--set2set-lstm-layer", type=int, default=3)
    p.add_argument("--num-copies", type=int, default=1)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--save-freq", type=int, default=1)
    # Reference flags that are dead code there (never read past argparse)
    # and intentionally absent here: --readout, --subgraph-size,
    # --freq-embedding-size, --max-node-freq, --max-edge-freq, --gpu
    # (device selection is jax's), --tb-freq/--tb-path (use
    # --tensorboard). See docs/PARITY.md.
    p.add_argument("--aug", default="rwr", choices=["rwr", "ns"])
    p.add_argument("--n-max", type=int, default=512)
    p.add_argument("--e-max", type=int, default=8192)
    p.add_argument("--emit", default="auto",
                   choices=["auto", "pairs", "stacked", "routed"],
                   help="input pipeline emission mode (pipeline.py): auto "
                        "upgrades to stacked when the fast path supports "
                        "it; routed adds size-bucket batch routing "
                        "(~99%% of dispatches at 4x less N^2 device work; "
                        "size-homogeneous batch composition)")
    p.add_argument("--n-small", type=int, default=128,
                   help="small node bucket for --emit routed")
    p.add_argument("--dp-devices", type=int, default=1,
                   help="data-parallel device count: shards the batch "
                        "over the first N devices of a ('data',) mesh "
                        "with the full production path (stacked/routed "
                        "wire, packed state); 1 = single chip")
    p.add_argument("--exp", default="")
    p.add_argument("--dataset", default="corpus")


def _cfg_from_args(args):
    from gcc_tpu.config import (
        ContrastConfig, EncoderConfig, OptimConfig, SamplerConfig, TrainConfig,
    )

    return TrainConfig(
        exp=args.exp,
        dataset=args.dataset,
        batch_size=args.batch_size,
        epochs=args.epochs,
        num_samples=args.num_samples,
        num_workers=args.num_workers,
        seed=args.seed,
        sampler=SamplerConfig(
            rw_hops=args.rw_hops, restart_prob=args.restart_prob,
            aug=args.aug,
        ),
        print_freq=args.print_freq,
        save_freq=args.save_freq,
        encoder=EncoderConfig(
            model=args.model, num_layers=args.num_layer,
            hidden_size=args.hidden_size, output_size=args.hidden_size,
            positional_embedding_size=args.positional_embedding_size,
            degree_embedding_size=args.degree_embedding_size,
            max_degree=args.max_degree, pe_method=args.pe_method,
            norm=not args.no_norm, set2set_iter=args.set2set_iter,
            set2set_lstm_layer=args.set2set_lstm_layer,
        ),
        contrast=ContrastConfig(
            moco=args.moco, nce_k=args.nce_k, nce_t=args.nce_t,
            alpha=args.alpha,
        ),
        optim=OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            optimizer=args.optimizer, beta1=args.beta1, beta2=args.beta2,
            momentum=args.momentum, clip_norm=args.clip_norm,
        ),
    )


def cmd_synth_corpus(args):
    from gcc_tpu.graph.corpus import synthetic_corpus

    store = synthetic_corpus(
        args.out, num_graphs=args.num_graphs,
        nodes_per_graph=args.nodes_per_graph, avg_degree=args.avg_degree,
        seed=args.seed,
    )
    print(f"wrote {store.num_graphs} graphs, sizes {store.graph_sizes}")


def cmd_ingest(args):
    from gcc_tpu.data.ingest import ingest_edgelists

    store = ingest_edgelists(args.files, args.out)
    print(f"wrote {store.num_graphs} graphs, sizes {store.graph_sizes}")


def cmd_pretrain(args):
    from gcc_tpu.sampling.pipeline import PipelineConfig
    from gcc_tpu.training.loop import run_pretrain

    cfg = _cfg_from_args(args)
    if cfg.dataset != "corpus":
        # Pretrain on a single evaluation dataset's graph(s) (the
        # reference's non-"dgl" branch, train.py:558-573): materialize a
        # one-off corpus from the dataset and train on it.
        import tempfile

        from gcc_tpu.data.formats import GRAPH_CLASSIFICATION_DSETS
        from gcc_tpu.graph.corpus import CorpusStore

        tmp = tempfile.mkdtemp(prefix="gcc_tpu_dscorpus_")
        if cfg.dataset in GRAPH_CLASSIFICATION_DSETS:
            from gcc_tpu.data.tu import load_tu_dataset

            graphs, _ = load_tu_dataset(cfg.dataset, args.data_root)
        else:
            from gcc_tpu.data.formats import create_node_classification_dataset

            graphs = [create_node_classification_dataset(
                cfg.dataset, args.data_root).graph]
        CorpusStore.create(tmp, graphs)
        args.corpus = tmp
    pcfg = PipelineConfig(
        batch_size=cfg.batch_size, n_max=args.n_max, e_max=args.e_max,
        num_samples=cfg.num_samples, num_workers=cfg.num_workers,
        num_copies=args.num_copies, n_small=args.n_small,
        **({} if args.emit == "auto" else {"emit": args.emit}),
    )
    summary = run_pretrain(cfg, args.corpus, args.out, pcfg,
                           resume=args.resume or None,
                           tensorboard=args.tensorboard,
                           profile_dir=args.profile_dir or None,
                           dp_devices=args.dp_devices)
    print(summary)


def cmd_generate(args):
    import jax

    from gcc_tpu.training.checkpoint import load_checkpoint, load_config
    from gcc_tpu.generate import generate_embeddings, node_subgraphs
    from gcc_tpu.data.formats import GRAPH_CLASSIFICATION_DSETS

    run_dir = os.path.dirname(args.ckpt)
    cfg = load_config(run_dir)
    state = load_checkpoint(args.ckpt)
    # Restored as raw pytree dict; wrap minimal access.
    from types import SimpleNamespace

    state = SimpleNamespace(**state) if isinstance(state, dict) else state

    if args.dataset in GRAPH_CLASSIFICATION_DSETS:
        from gcc_tpu.data.tu import load_tu_dataset
        from gcc_tpu.generate import generate_graph_embeddings

        graphs, _ = load_tu_dataset(args.dataset, args.data_root)
        # Graphs beyond the dense bucket route to the partitioned
        # giant path (whole-graph PE over the "part" mesh axis —
        # generate.generate_graph_embeddings).
        emb = generate_graph_embeddings(cfg, state, graphs,
                                        n_max=args.n_max, e_max=args.e_max,
                                        readout=args.graph_readout)
    else:
        from gcc_tpu.data.formats import create_node_classification_dataset

        data = create_node_classification_dataset(args.dataset, args.data_root)
        subs, subs_k = node_subgraphs(data.graph, cfg, args.n_max,
                                      args.e_max, two_views=True)
        emb = generate_embeddings(cfg, state, subs, n_max=args.n_max,
                                  e_max=args.e_max, subgraphs_k=subs_k)
    out = args.out or os.path.join(run_dir, f"{args.dataset}.npy")
    np.save(out, emb)
    print(f"saved {emb.shape} -> {out}")


def cmd_finetune(args):
    import jax

    from gcc_tpu.data.formats import GRAPH_CLASSIFICATION_DSETS
    from gcc_tpu.training.checkpoint import load_checkpoint, load_config
    from gcc_tpu.training.finetune import (
        GraphLabeledData, NodeLabeledData, run_finetune_cv,
    )

    pretrained_params = pretrained_stats = None
    if args.ckpt:
        run_dir = os.path.dirname(args.ckpt)
        cfg = load_config(run_dir)
        state = load_checkpoint(args.ckpt)
        pretrained_params = state["params"]
        pretrained_stats = state.get("batch_stats", {})
    else:
        cfg = _cfg_from_args(args)
    cfg = dataclasses.replace(cfg, epochs=args.epochs, seed=args.seed,
                              batch_size=args.batch_size)

    if args.dataset in GRAPH_CLASSIFICATION_DSETS:
        from gcc_tpu.data.tu import load_tu_dataset

        graphs, labels = load_tu_dataset(args.dataset, args.data_root)
        data = GraphLabeledData(graphs, labels, n_max=args.n_max,
                                e_max=args.e_max)
    else:
        from gcc_tpu.data.formats import create_node_classification_dataset

        nd = create_node_classification_dataset(args.dataset, args.data_root)
        data = NodeLabeledData(nd.graph, nd.y, cfg, n_max=args.n_max,
                               e_max=args.e_max)
    folds = range(10) if args.cv else [args.fold_idx]
    res = run_finetune_cv(cfg, data, pretrained_params, pretrained_stats,
                          folds=folds)
    print(res)


def cmd_eval_node(args):
    from gcc_tpu.tasks import NodeClassification

    kwargs = {"emb_path": args.emb} if args.model == "from_numpy" else {}
    task = NodeClassification(args.dataset, args.hidden_size, args.seed,
                              model=args.model, data_root=args.data_root,
                              **kwargs)
    print(task.train())


def cmd_eval_graph(args):
    from gcc_tpu.tasks import GraphClassification

    task = GraphClassification(args.dataset, args.hidden_size, args.seed,
                               model="from_numpy_graph", emb_path=args.emb,
                               data_root=args.data_root)
    print(task.train())


def cmd_eval_sim(args):
    from gcc_tpu.tasks import SimilaritySearch

    d1, d2 = args.dataset.split("_")
    kwargs = {}
    if args.model == "from_numpy_align":
        if not (args.emb1 and args.emb2):
            raise SystemExit("--emb1/--emb2 required with model "
                             "from_numpy_align")
        kwargs = {"emb_path_1": args.emb1, "emb_path_2": args.emb2}
    elif args.emb1 or args.emb2:
        raise SystemExit(
            f"--emb1/--emb2 only apply to model from_numpy_align; model "
            f"{args.model!r} trains from the graphs and would silently "
            f"ignore them"
        )
    task = SimilaritySearch(d1, d2, args.hidden_size, model=args.model,
                            data_root=args.data_root, **kwargs)
    print(task.train())


def main(argv=None):
    parser = argparse.ArgumentParser("gcc_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth-corpus")
    p.add_argument("--out", required=True)
    p.add_argument("--num-graphs", type=int, default=6)
    p.add_argument("--nodes-per-graph", type=int, default=20000)
    p.add_argument("--avg-degree", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_synth_corpus)

    p = sub.add_parser("ingest")
    p.add_argument("files", nargs="+")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("pretrain")
    p.add_argument("--corpus", default="",
                   help="corpus dir (not needed with --dataset <eval-set>)")
    p.add_argument("--out", default="saved")
    p.add_argument("--data-root", default="data")
    p.add_argument("--resume", default="", help="checkpoint path to resume")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--profile-dir", default="",
                   help="capture a jax.profiler trace here")
    _add_train_flags(p)
    p.set_defaults(fn=cmd_pretrain)

    p = sub.add_parser("finetune")
    p.add_argument("--ckpt", default="",
                   help="pretrained checkpoint (omit to train from scratch)")
    p.add_argument("--cv", action="store_true", help="run all 10 folds")
    p.add_argument("--fold-idx", type=int, default=0)
    p.add_argument("--data-root", default="data")
    _add_train_flags(p)  # includes --n-max/--e-max bucket flags
    p.set_defaults(fn=cmd_finetune)

    p = sub.add_parser("generate")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--data-root", default="data")
    p.add_argument("--n-max", type=int, default=512)
    p.add_argument("--e-max", type=int, default=8192)
    p.add_argument("--graph-readout", default="score",
                   choices=["score", "composite"],
                   help="graph-classification datasets only: 'score' = "
                        "the reference's 64-d summed-head embedding; "
                        "'composite' = mean-pooled input + per-layer "
                        "L2'd conv sums (beats an explicit degree "
                        "histogram on the sub-ceiling benchmark — "
                        "generate.composite_graph_readout)")
    p.set_defaults(fn=cmd_generate)

    for name, fn in [("eval-node", cmd_eval_node), ("eval-graph", cmd_eval_graph)]:
        p = sub.add_parser(name)
        p.add_argument("--dataset", required=True)
        p.add_argument("--emb", default="")
        p.add_argument("--model", default="from_numpy",
                       help="embedding source: from_numpy/prone/graphwave/zero")
        p.add_argument("--hidden-size", type=int, default=64)
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--data-root", default="data")
        p.set_defaults(fn=fn)

    p = sub.add_parser("eval-sim")
    p.add_argument("--dataset", required=True)  # e.g. kdd_icdm
    p.add_argument("--emb1", default="")
    p.add_argument("--emb2", default="")
    p.add_argument("--model", default="from_numpy_align",
                   help="from_numpy_align (GCC embeddings) or a classical "
                        "baseline: prone/graphwave/zero")
    p.add_argument("--hidden-size", type=int, default=64)
    p.add_argument("--data-root", default="data")
    p.set_defaults(fn=cmd_eval_sim)

    args = parser.parse_args(argv)
    _enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
