"""A/B: table-gather RBF path vs dense-edge-operand classed path, one process,
interleaved reps (relay variance rule). Also A/B the full train step."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from na_mpnn_tpu.models import ModelConfig, init_params
from na_mpnn_tpu.ops import rbf_classed
from __graft_entry__ import _synthetic_batch

B, L, K = 8, 768, 32


def timer(fn, args, n_iter=20):
    carry = jnp.float32(0.0)
    carry = fn(carry, *args)
    assert np.isfinite(float(carry))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        carry = fn(carry, *args)
    assert np.isfinite(float(carry))
    return (time.perf_counter() - t0) / n_iter


def main():
    cfg = ModelConfig(dropout=0.0, compute_dtype="bfloat16")
    np_batch = _synthetic_batch(B=B, L=L)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    params = init_params(jax.random.PRNGKey(0), cfg)

    from na_mpnn_tpu.models.features import build_augmented_atoms
    from na_mpnn_tpu.ops.knn import knn_graph_pallas

    X_aug, X_m_aug, X_ref = build_augmented_atoms(
        batch["X"], batch["X_m"], batch, cfg)
    mask = batch["mask"]
    _, E_idx = knn_graph_pallas(X_ref, mask, cfg.k_neighbors)
    W = params["features"]["edge_embedding"]["w"]
    n_pos = cfg.num_positional_embeddings
    Wr = W[n_pos:]

    real_ok = rbf_classed.table_rbf_ok

    def run(use_table):
        rbf_classed.table_rbf_ok = (real_ok if use_table
                                    else (lambda *a: False))

        @jax.jit
        def fn(carry, X_aug):
            out = rbf_classed.rbf_edge_features_classed(
                X_aug + carry * 0.0, X_m_aug, E_idx, Wr,
                compute_dtype=jnp.bfloat16)
            return jnp.sum(out)

        return fn

    fn_t = run(True)
    t_t = timer(fn_t, (X_aug,))          # compile both first
    fn_d = run(False)
    t_d = timer(fn_d, (X_aug,))
    best_t, best_d = t_t, t_d
    for _ in range(3):                    # interleave
        rbf_classed.table_rbf_ok = real_ok
        best_t = min(best_t, timer(fn_t, (X_aug,)))
        rbf_classed.table_rbf_ok = lambda *a: False
        best_d = min(best_d, timer(fn_d, (X_aug,)))
    rbf_classed.table_rbf_ok = real_ok
    print(f"rbf table path:  {best_t*1e3:.3f} ms", flush=True)
    print(f"rbf dense path:  {best_d*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
