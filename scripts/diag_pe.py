"""Decompose the featurize/PE device cost op-group by op-group.

Times (device-resident, scan-8 to amortize dispatch):
  expand+adjacency build | +normalized M | PE iterate kernel alone |
  full laplacian PE | full featurize.

Usage: timeout 3000 python scripts/diag_pe.py [steps_per_call]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from gcc_tpu.training.pretrain import _as_padded  # noqa: E402


def main():
    spc = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp

    from gcc_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from gcc_tpu.config import SamplerConfig, TrainConfig
    from gcc_tpu.graph.corpus import CorpusStore, synthetic_corpus
    from gcc_tpu.sampling.pipeline import PipelineConfig, PretrainPipeline
    from gcc_tpu.training import stack_batches
    from gcc_tpu.graph.batch import concat_padded
    from gcc_tpu.ops.aggregate import build_dense_adjacency
    from gcc_tpu.features.positional import (
        laplacian_positional_embedding, normalized_adjacency,
    )
    from gcc_tpu.features import featurize_batch

    corpus_dir = os.environ.get("GCC_TPU_BENCH_CORPUS",
                                "/tmp/gcc_tpu_bench_corpus")
    if not os.path.exists(os.path.join(corpus_dir, "manifest.json")):
        synthetic_corpus(corpus_dir, num_graphs=6, nodes_per_graph=100_000,
                         avg_degree=12, seed=0)
    store = CorpusStore.open(corpus_dir)
    cfg = TrainConfig(batch_size=bench.BATCH_SIZE,
                      sampler=SamplerConfig(rw_hops=bench.RW_HOPS))
    pcfg = PipelineConfig(
        batch_size=bench.BATCH_SIZE, n_max=bench.N_MAX, e_max=bench.E_MAX,
        num_samples=10_000, num_workers=1, prefetch=8,
        threads_per_worker=2, mode="thread",
    )

    def log(msg):
        print(f"[diag] {msg}", flush=True)

    with PretrainPipeline(store, cfg.sampler, pcfg, seed=0) as pipe:
        pairs = [next(pipe) for _ in range(spc)]
        dq = jax.device_put(stack_batches([q for q, _ in pairs]))
        dk = jax.device_put(stack_batches([k for _, k in pairs]))

    def scan8(fn):
        @jax.jit
        def run(bq_stack, bk_stack):
            def body(c, xs):
                q, k = xs
                both = concat_padded(_as_padded(q, bench.N_MAX),
                                     _as_padded(k, bench.N_MAX))
                out = fn(both)
                return c + jnp.sum(out), None

            out, _ = jax.lax.scan(body, 0.0, (bq_stack, bk_stack))
            return out

        return run

    def timeit(fn, label, n_calls=10):
        out = fn(dq, dk)
        _ = np.asarray(out)
        t0 = time.time()
        for _ in range(n_calls):
            out = fn(dq, dk)
        _ = np.asarray(out)
        dt = (time.time() - t0) / n_calls
        log(f"{label}: {1e3 * dt / spc:.2f} ms/step")

    timeit(scan8(lambda b: build_dense_adjacency(b)[:, 0, 0]),
           "expand + dense adjacency")
    timeit(scan8(lambda b: normalized_adjacency(b)[:, 0, 0]),
           "expand + normalized M")

    # PE iterate kernel alone on a fixed M (no adjacency rebuild).
    from gcc_tpu.ops.pe_pallas import pe_subspace_iterate

    rng = np.random.default_rng(0)
    m_host = rng.normal(size=(64, bench.N_MAX, bench.N_MAX)).astype(np.float32)
    m_host = (m_host + m_host.transpose(0, 2, 1)) / 2
    q0_host = rng.normal(size=(64, bench.N_MAX, 32)).astype(np.float32)
    m_dev, q0_dev = jax.device_put((m_host, q0_host))

    @jax.jit
    def pe_scan(m, q0):
        def body(c, _):
            out = pe_subspace_iterate(m, q0, iters=16, orth_every=8)
            return c + jnp.sum(out[:, 0, 0]), None

        out, _ = jax.lax.scan(body, 0.0, None, length=spc)
        return out

    out = pe_scan(m_dev, q0_dev); _ = np.asarray(out)
    t0 = time.time()
    for _ in range(10):
        out = pe_scan(m_dev, q0_dev)
    _ = np.asarray(out)
    log(f"PE iterate kernel alone: {1e3 * (time.time() - t0) / 10 / spc:.2f}"
        " ms/step")

    timeit(scan8(lambda b: laplacian_positional_embedding(
        b, 32, method="subspace")[:, 0, 0]), "full laplacian PE")
    timeit(scan8(lambda b: featurize_batch(b, 32, pe_method="subspace")
                 .pos[:, 0, 0]), "full featurize")


if __name__ == "__main__":
    main()


def finish_pieces():
    """Time the PE finish ops individually (chol-QR, RR eigh, canon)."""
    import jax
    import jax.numpy as jnp

    spc = 8
    rng = np.random.default_rng(0)
    q_host = rng.normal(size=(64, 256, 32)).astype(np.float32)
    m_host = rng.normal(size=(64, 256, 256)).astype(np.float32)
    m_host = (m_host + m_host.transpose(0, 2, 1)) / 2
    t_host = rng.normal(size=(64, 32, 32)).astype(np.float32)
    t_host = (t_host + t_host.transpose(0, 2, 1)) / 2
    q_dev, m_dev, t_dev = jax.device_put((q_host, m_host, t_host))

    def timeit(fn, label, *args):
        run = jax.jit(lambda *a: jax.lax.scan(
            lambda c, _: (c + jnp.sum(fn(*a)[:, 0, 0]), None), 0.0, None,
            length=spc)[0])
        out = run(*args); _ = np.asarray(out)
        t0 = time.time()
        for _ in range(10):
            out = run(*args)
        _ = np.asarray(out)
        print(f"[diag] {label}: {1e3 * (time.time() - t0) / 10 / spc:.2f} "
              "ms/step", flush=True)

    eye_k = np.eye(32, dtype=np.float32)

    def orth_chol(q):
        norm = jnp.linalg.norm(q, axis=1, keepdims=True)
        q = q / jnp.maximum(norm, 1e-20)
        gram = jnp.einsum("bni,bnj->bij", q, q)
        r = jnp.linalg.cholesky(gram + 1e-5 * eye_k)
        return jax.lax.linalg.triangular_solve(
            r, q, left_side=False, lower=True, transpose_a=True)

    timeit(orth_chol, "orth_chol (cholesky+trisolve)", q_dev)
    timeit(lambda t: jnp.linalg.eigh(t)[1], "eigh (64,32,32)", t_dev)

    def canon(q):
        idx = jnp.argmax(jnp.abs(q), axis=1, keepdims=True)
        ref = jnp.take_along_axis(q, idx, axis=1)
        q = q * jnp.sign(jnp.where(ref == 0, 1.0, ref))
        norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        return q / jnp.where(norm == 0, 1.0, norm)

    timeit(canon, "sign canon + row norm", q_dev)

    def rr(q, m):
        mq = jax.lax.dot_general(m, q, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        t = jnp.einsum("bni,bnj->bij", q, mq)
        t = 0.5 * (t + jnp.swapaxes(t, 1, 2))
        _, u = jnp.linalg.eigh(t)
        return jax.lax.dot_general(q, u[:, :, ::-1], dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)

    timeit(rr, "full Rayleigh-Ritz", q_dev, m_dev)


if __name__ == "__main__" and os.environ.get("DIAG_FINISH"):
    finish_pieces()
