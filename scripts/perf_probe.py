"""Quick perf probe for kernel iteration: measures selected stages with the
same chained-timing discipline as bench.py but fewer windows. Usage:

    python scripts/perf_probe.py train encode rbf knn fwd

Prints one JSON line per stage.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, L, K = 8, 768, 32
N_WINDOWS = int(os.environ.get("PROBE_WINDOWS", "3"))


def _chain_timer(fn, args, n_iter, n_windows=N_WINDOWS):
    import jax
    import jax.numpy as jnp

    jit_fn = jax.jit(fn)
    carry = jnp.float32(0.0)
    carry = jit_fn(carry, *args)
    assert np.isfinite(float(carry))
    times = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            carry = jit_fn(carry, *args)
        assert np.isfinite(float(carry))
        times.append((time.perf_counter() - t0) / n_iter)
    return min(times)


def main():
    stages = sys.argv[1:] or ["train", "encode"]
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import ModelConfig, init_params
    from na_mpnn_tpu.models import mpnn
    from __graft_entry__ import _synthetic_batch

    train_cfg = ModelConfig(dropout=0.1, protein_augment_eps=0.1,
                            dna_augment_eps=0.1, rna_augment_eps=0.1,
                            compute_dtype="bfloat16")
    fwd_cfg = ModelConfig(dropout=0.0, compute_dtype="bfloat16")
    np_batch = _synthetic_batch(B=B, L=L)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    params = init_params(jax.random.PRNGKey(0), fwd_cfg)
    out = {}

    if "train" in stages:
        from na_mpnn_tpu.train.trainer import Trainer
        trainer = Trainer(train_cfg, seed=0)
        key = jax.random.PRNGKey(0)
        trainer.train_step(np_batch, key)
        times = []
        n_iter = 8
        for w in range(N_WINDOWS):
            for i in range(2):
                trainer.train_step(np_batch, jax.random.fold_in(key, 100 * w + i))
            t0 = time.perf_counter()
            for i in range(n_iter):
                m = trainer.train_step(np_batch,
                                       jax.random.fold_in(key, 100 * w + 10 + i))
            assert np.isfinite(float(m["loss_av"]))
            times.append((time.perf_counter() - t0) / n_iter)
        out["train_step_ms"] = min(times) * 1e3
        out["train_edges_per_s"] = B * L * K / min(times)

    if {"trainfwd", "grad", "opt", "metrics"} & set(stages):
        from na_mpnn_tpu.train.trainer import Trainer
        trainer = Trainer(train_cfg, seed=0)
        key = jax.random.PRNGKey(7)
        dbatch = {k: jnp.asarray(v) for k, v in np_batch.items()
                  if k in __import__("na_mpnn_tpu.train.trainer",
                                     fromlist=["BATCH_KEYS"]).BATCH_KEYS}
        params, opt_state = trainer.params, trainer.opt_state

        if "trainfwd" in stages:
            def fwd_fn(carry, params, batch):
                k2 = jax.random.fold_in(key, (carry * 0).astype(jnp.int32))
                loss, _ = trainer._loss_fn(params, batch, k2)
                return jnp.sum(loss)
            out["trainfwd_ms"] = _chain_timer(fwd_fn, (params, dbatch), 10) * 1e3

        if "grad" in stages:
            def grad_fn(carry, params, batch):
                k2 = jax.random.fold_in(key, (carry * 0).astype(jnp.int32))
                (loss, _), grads = jax.value_and_grad(
                    trainer._loss_fn, has_aux=True)(params, batch, k2)
                return jnp.sum(loss) + sum(jnp.sum(jnp.abs(g)) * 0.0
                                  for g in jax.tree.leaves(grads))
            out["valgrad_ms"] = _chain_timer(grad_fn, (params, dbatch), 10) * 1e3

        if "opt" in stages:
            grads = jax.tree.map(jnp.ones_like, params)
            def opt_fn(carry, grads, opt_state, params):
                from jax.flatten_util import ravel_pytree
                g = jax.tree.map(lambda x: x + carry * 0.0, grads)
                flat_g, _ = ravel_pytree(g)
                updates_flat, _ = trainer.optimizer.update(flat_g, opt_state)
                updates = trainer._unravel_params(updates_flat)
                return sum(jnp.sum(u) * 0.0 for u in jax.tree.leaves(updates)) + carry * 0
            out["opt_ms"] = _chain_timer(opt_fn, (grads, opt_state, params), 20) * 1e3

        if "metrics" in stages:
            lp = jnp.zeros((B, L, 33), jnp.float32)
            from na_mpnn_tpu.train.losses import mask_for_loss
            mfl = mask_for_loss(dbatch["S"], dbatch["mask"], True).astype(jnp.float32)
            def met_fn(carry, lp, batch):
                m = trainer._metrics_from_logprobs(batch, lp + carry * 0.0, mfl)
                return jnp.sum(m["loss_per_token"]) + jnp.sum(m["accuracy"]) * 0.0
            out["metrics_ms"] = _chain_timer(met_fn, (lp, dbatch), 20) * 1e3

    if "trainjit" in stages:
        # The fused donated train step on a device-resident batch: isolates
        # device step time from the per-step numpy H2D feed in `train`.
        from na_mpnn_tpu.train.trainer import Trainer
        trainer = Trainer(train_cfg, seed=0)
        key = jax.random.PRNGKey(7)
        dbatch = trainer._device_batch(np_batch)
        p, o = trainer.params, trainer.opt_state
        p, o, m = trainer._train_step(p, o, dbatch, key)
        times = []
        n_iter = 10
        for w in range(N_WINDOWS):
            t0 = time.perf_counter()
            for i in range(n_iter):
                p, o, m = trainer._train_step(p, o, dbatch,
                                              jax.random.fold_in(key, i))
            assert np.isfinite(float(m["loss_av"]))
            times.append((time.perf_counter() - t0) / n_iter)
        out["trainjit_ms"] = min(times) * 1e3

    if "encode" in stages:
        def encode_fn(carry, batch):
            b = dict(batch)
            b["X"] = batch["X"] + carry * 0.0
            h_V, h_E, _ = mpnn.encode(params, fwd_cfg, b)
            return jnp.sum(h_V.astype(jnp.float32))
        out["encode_ms"] = _chain_timer(encode_fn, (batch,), 20) * 1e3

    if "fwd" in stages:
        def full_fn(carry, batch):
            b = dict(batch)
            b["X"] = batch["X"] + carry * 0.0
            lp, _ = mpnn.forward(params, fwd_cfg, b)
            return jnp.sum(lp)
        out["forward_ms"] = _chain_timer(full_fn, (batch,), 20) * 1e3

    if "feat" in stages:
        from na_mpnn_tpu.models.features import features_apply
        def feat_fn(carry, batch):
            b = dict(batch)
            b["X"] = batch["X"] + carry * 0.0
            V, E, E_idx, _ = features_apply(params["features"], fwd_cfg, b)
            return jnp.sum(E) + jnp.sum(V)
        out["featurizer_ms"] = _chain_timer(feat_fn, (batch,), 20) * 1e3

    if "rbf" in stages:
        from na_mpnn_tpu.models.features import build_augmented_atoms
        from na_mpnn_tpu.ops.knn import knn_graph_pallas
        from na_mpnn_tpu.ops.rbf_classed import rbf_edge_features_classed
        X_aug, X_m_aug, X_ref = build_augmented_atoms(
            jnp.asarray(batch["X"]), jnp.asarray(batch["X_m"]), batch, fwd_cfg)
        mask = jnp.asarray(batch["mask"])
        _, E_idx = knn_graph_pallas(X_ref, mask, fwd_cfg.k_neighbors)
        W = params["features"]["edge_embedding"]["w"]
        n_pos = fwd_cfg.num_positional_embeddings

        def rbf_fn(carry, X_aug):
            o = rbf_edge_features_classed(X_aug + carry * 0.0, X_m_aug, E_idx,
                                          W[n_pos:],
                                          compute_dtype=jnp.bfloat16)
            return jnp.sum(o.astype(jnp.float32))
        out["rbf_ms"] = _chain_timer(rbf_fn, (X_aug,), 20) * 1e3

    if "knn" in stages:
        from na_mpnn_tpu.models.features import build_augmented_atoms
        from na_mpnn_tpu.ops.knn import knn_graph_pallas
        _, _, X_ref = build_augmented_atoms(
            jnp.asarray(batch["X"]), jnp.asarray(batch["X_m"]), batch, fwd_cfg)
        mask = jnp.asarray(batch["mask"])

        def knn_fn(carry, X_ref):
            _, E_idx = knn_graph_pallas(X_ref + carry * 0.0, mask,
                                        fwd_cfg.k_neighbors)
            return jnp.sum(E_idx).astype(jnp.float32)
        out["knn_ms"] = _chain_timer(knn_fn, (X_ref,), 20) * 1e3

    print(json.dumps({k: float(f"{v:.5g}") for k, v in out.items()}))


if __name__ == "__main__":
    main()
