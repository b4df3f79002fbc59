"""Per-kernel fwd/bwd timing at the bench training shape (B=8, L=768, K=32),
ONE process, interleaved windows with a kNN anchor (relay discipline: never
compare timings across processes; see bench.py module notes).

Times each Pallas message kernel's forward and backward pallas_call directly
(plus the RBF featurizer's fwd/VJP and the XLA-tail-only layer backward), so
the 26 ms derived-backward slab of BENCH_r04 can be attributed to specific
kernels before optimizing them.

Usage: python scripts/profile_kernels.py [--windows N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, L, K, H = 8, 768, 32, 128
N = B * L


def chain(fn, args, n_iter):
    jfn = jax.jit(fn)
    c = jfn(jnp.float32(0.0), *args)
    assert np.isfinite(float(c))
    def run():
        cc = c
        t0 = time.perf_counter()
        for _ in range(n_iter):
            cc = jfn(cc, *args)
        assert np.isfinite(float(cc))
        return (time.perf_counter() - t0) / n_iter
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=4)
    args = ap.parse_args()

    from na_mpnn_tpu.models import ModelConfig, init_params
    from na_mpnn_tpu.models.features import build_augmented_atoms
    from na_mpnn_tpu.ops.knn import knn_graph_pallas
    from na_mpnn_tpu.ops import message_kernels as mk
    from na_mpnn_tpu.ops.rbf_classed import rbf_edge_features_classed
    from __graft_entry__ import _synthetic_batch

    cfg = ModelConfig(dropout=0.1, compute_dtype="bfloat16")
    cdt = jnp.bfloat16
    np_batch = _synthetic_batch(B=B, L=L)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    params = init_params(jax.random.PRNGKey(0), cfg)
    mask = batch["mask"].astype(cdt)

    X_aug, X_m_aug, X_ref = build_augmented_atoms(batch["X"], batch["X_m"],
                                                  batch, cfg)
    _, E_idx = knn_graph_pallas(X_ref, batch["mask"], K)
    E_idx = jax.block_until_ready(E_idx)

    key = jax.random.PRNGKey(0)
    h_V = jax.random.normal(key, (B, L, H), cdt)
    h_E = jax.random.normal(jax.random.fold_in(key, 1), (B, L, K, H), cdt)
    mask_attend = jnp.ones((B, L, K), cdt)
    p_enc = jax.tree.map(lambda x: x.astype(cdt) if x.dtype == jnp.float32
                         else x, params["encoder"][0])
    p_dec = jax.tree.map(lambda x: x.astype(cdt) if x.dtype == jnp.float32
                         else x, params["decoder"][0])

    timers = {}

    # ---- anchor: kNN kernel (for window normalization) ----
    def knn_fn(c, X_ref):
        _, E = knn_graph_pallas(X_ref + c * 0.0, batch["mask"], K)
        return jnp.sum(E).astype(jnp.float32)
    timers["anchor_knn"] = chain(knn_fn, (X_ref,), 20)

    # ---- encoder agg (table): fwd and fwd+bwd ----
    def enc_agg_fwd(c, h_V, h_E):
        wc = p_enc["W1"]["w"][2 * H:]
        dh = mk.message_agg_table_batched(
            p_enc, h_V + c.astype(cdt) * 0, h_E, jnp.dot(h_V, wc), E_idx,
            mask_attend, compute_dtype=cdt)
        return jnp.sum(dh).astype(jnp.float32)
    timers["enc_agg_fwd"] = chain(enc_agg_fwd, (h_V, h_E), 20)

    def enc_agg_vjp(c, h_V, h_E):
        def f(hv, he):
            wc = p_enc["W1"]["w"][2 * H:]
            dh = mk.message_agg_table_batched(
                p_enc, hv, he, jnp.dot(hv, wc), E_idx, mask_attend,
                compute_dtype=cdt)
            return jnp.sum(dh).astype(jnp.float32)
        v, g = jax.value_and_grad(f, argnums=(0, 1))(
            h_V + c.astype(cdt) * 0, h_E)
        return v + sum(jnp.sum(x).astype(jnp.float32) * 0 for x in g)
    timers["enc_agg_fwd_bwd"] = chain(enc_agg_vjp, (h_V, h_E), 10)

    # ---- encoder edge-update (table) ----
    def enc_edge_fwd(c, h_V, h_E):
        wc11 = p_enc["W11"]["w"][2 * H:]
        m = mk.message_edge_table_batched(
            p_enc, h_V + c.astype(cdt) * 0, h_E, jnp.dot(h_V, wc11), E_idx,
            compute_dtype=cdt)
        return jnp.sum(m).astype(jnp.float32)
    timers["enc_edge_fwd"] = chain(enc_edge_fwd, (h_V, h_E), 20)

    def enc_edge_vjp(c, h_V, h_E):
        def f(hv, he):
            wc11 = p_enc["W11"]["w"][2 * H:]
            m = mk.message_edge_table_batched(
                p_enc, hv, he, jnp.dot(hv, wc11), E_idx, compute_dtype=cdt)
            return jnp.sum(m).astype(jnp.float32)
        v, g = jax.value_and_grad(f, argnums=(0, 1))(
            h_V + c.astype(cdt) * 0, h_E)
        return v + sum(jnp.sum(x).astype(jnp.float32) * 0 for x in g)
    timers["enc_edge_fwd_bwd"] = chain(enc_edge_vjp, (h_V, h_E), 10)

    # ---- decoder (table, 3H context) ----
    from na_mpnn_tpu.models.modules import _split_w1
    h_S = jax.random.normal(jax.random.fold_in(key, 2), (B, L, H), cdt)
    mask_bw = jnp.ones((B, L, K, 1), cdt) * 0.5

    def dec_fwd(c, h_V, h_E, h_S):
        (_, _, ws, wv), _ = _split_w1(p_dec, H)
        venc = jnp.dot(h_V, wv)
        nodes2 = jnp.concatenate([jnp.dot(h_S, ws), venc], axis=-1)
        dh = mk.message_dec_table_batched(
            p_dec, h_V + c.astype(cdt) * 0, h_E, nodes2, E_idx, mask,
            mask_bw, compute_dtype=cdt)
        return jnp.sum(dh).astype(jnp.float32)
    timers["dec_fwd"] = chain(dec_fwd, (h_V, h_E, h_S), 20)

    def dec_vjp(c, h_V, h_E, h_S):
        def f(hv, he, hs):
            (_, _, ws, wv), _ = _split_w1(p_dec, H)
            venc = jnp.dot(hv, wv)
            nodes2 = jnp.concatenate([jnp.dot(hs, ws), venc], axis=-1)
            dh = mk.message_dec_table_batched(
                p_dec, hv, he, nodes2, E_idx, mask, mask_bw,
                compute_dtype=cdt)
            return jnp.sum(dh).astype(jnp.float32)
        v, g = jax.value_and_grad(f, argnums=(0, 1, 2))(
            h_V + c.astype(cdt) * 0, h_E, h_S)
        return v + sum(jnp.sum(x).astype(jnp.float32) * 0 for x in g)
    timers["dec_fwd_bwd"] = chain(dec_vjp, (h_V, h_E, h_S), 10)

    # ---- RBF featurizer fwd / fwd+bwd ----
    W = params["features"]["edge_embedding"]["w"]
    n_pos = 16  # num_positional_embeddings

    def rbf_fwd(c, X_aug):
        out = rbf_edge_features_classed(X_aug + c * 0.0, X_m_aug, E_idx,
                                        W[n_pos:], compute_dtype=cdt)
        return jnp.sum(out)
    timers["rbf_fwd"] = chain(rbf_fwd, (X_aug,), 20)

    def rbf_vjp(c, X_aug):
        # Differentiate w.r.t. the WEIGHTS: coordinates are stop_gradient'd
        # inside the classed kernel, so a grad w.r.t. X_aug would DCE the
        # whole dw kernel and time nothing (the r4 version of this probe
        # made exactly that mistake — its 1.2 ms "rbf backward" was a
        # zero-cotangent no-op).
        def f(w):
            out = rbf_edge_features_classed(X_aug + c * 0.0, X_m_aug, E_idx,
                                            w, compute_dtype=cdt)
            return jnp.sum(out)
        v, g = jax.value_and_grad(f)(W[n_pos:])
        return v + jnp.sum(g) * 0
    timers["rbf_fwd_bwd"] = chain(rbf_vjp, (X_aug,), 10)

    # ---- XLA tail of one encoder layer (norms + FFN + dropout), fwd+bwd ----
    from na_mpnn_tpu.models.modules import dropout, layer_norm, pff_apply

    def tail_vjp(c, h_V):
        def f(hv):
            k1 = jax.random.PRNGKey(3)
            hv = layer_norm(p_enc["norm1"], hv + dropout(hv, 0.1, k1, False))
            dh = pff_apply(p_enc["dense"], hv)
            hv = layer_norm(p_enc["norm2"], hv + dropout(dh, 0.1, k1, False))
            return jnp.sum(hv).astype(jnp.float32)
        v, g = jax.value_and_grad(f)(h_V + c.astype(cdt) * 0)
        return v + jnp.sum(g).astype(jnp.float32) * 0
    timers["enc_tail_fwd_bwd"] = chain(tail_vjp, (h_V,), 20)

    # ---- interleaved windows ----
    results = {k: [] for k in timers}
    for w in range(args.windows):
        for name, run in timers.items():
            results[name].append(run())
    out = {}
    for name, ts in results.items():
        out[name] = float(f"{min(ts) * 1e3:.4g}")
    # derived bwd-only numbers
    for base in ("enc_agg", "enc_edge", "dec", "rbf"):
        out[f"{base}_bwd_derived"] = float(
            f"{out[f'{base}_fwd_bwd'] - out[f'{base}_fwd']:.4g}")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
