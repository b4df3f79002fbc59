"""Pallas kernel unit tests (interpret mode; the reference semantics are the
jnp implementations in models/features.py, themselves parity-tested against
the torch reference)."""
import jax
import jax.numpy as jnp
import numpy as np

from na_mpnn_tpu.models import ModelConfig, init_params
from na_mpnn_tpu.models.features import (all_pair_rbf, build_augmented_atoms,
                                         knn_graph)
from na_mpnn_tpu.ops.knn import knn_graph_pallas
from na_mpnn_tpu.ops.rbf_edge import rbf_edge_features

from ref_oracle import make_synthetic_structure

CFG = ModelConfig(dropout=0.0)


def _geom(L=64, seed=0, B=2):
    batches = [make_synthetic_structure(L=L, seed=seed + i, n_protein=L // 2,
                                        n_dna=L // 4) for i in range(B)]
    batch = {k: jnp.concatenate([jnp.asarray(b[k]) for b in batches], axis=0)
             for k in batches[0]}
    X_aug, X_m_aug, X_ref = build_augmented_atoms(
        batch["X"].astype(jnp.float32), batch["X_m"], batch, CFG)
    return batch, X_aug, X_m_aug, X_ref


def test_knn_pallas_matches_reference():
    batch, _, _, X_ref = _geom(L=64)
    D_ref, E_ref = knn_graph(X_ref, batch["mask"], 32)
    D_p, E_p = knn_graph_pallas(X_ref, batch["mask"], 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(E_p), np.asarray(E_ref))
    np.testing.assert_allclose(np.asarray(D_p), np.asarray(D_ref), atol=1e-5)


def test_knn_pallas_masked_and_padded_lengths():
    # L=100: not a tile multiple -> exercises the padding path; also mask out
    # a few residues.
    batch, _, _, X_ref = _geom(L=100)
    mask = np.asarray(batch["mask"]).copy()
    mask[:, 40:45] = 0
    D_ref, E_ref = knn_graph(X_ref, jnp.asarray(mask), 32)
    D_p, E_p = knn_graph_pallas(X_ref, jnp.asarray(mask), 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(E_p), np.asarray(E_ref))


def test_rbf_edge_features_matches_reference():
    params = init_params(jax.random.PRNGKey(0), CFG)
    W = params["features"]["edge_embedding"]["w"][16:]
    batch, X_aug, X_m_aug, X_ref = _geom(L=64)
    _, E_idx = knn_graph(X_ref, batch["mask"], 32)
    ref = jnp.dot(all_pair_rbf(X_aug, E_idx, X_m_aug, 16), W)
    out = rbf_edge_features(X_aug, X_m_aug, E_idx, W, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_rbf_edge_features_grad_matches_reference():
    params = init_params(jax.random.PRNGKey(1), CFG)
    W = params["features"]["edge_embedding"]["w"][16:]
    batch, X_aug, X_m_aug, X_ref = _geom(L=32)
    _, E_idx = knn_graph(X_ref, batch["mask"], 32)
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 128))

    def loss_ref(W):
        return jnp.sum(jnp.dot(all_pair_rbf(X_aug, E_idx, X_m_aug, 16), W) * g)

    def loss_pal(W):
        return jnp.sum(rbf_edge_features(X_aug, X_m_aug, E_idx, W,
                                         interpret=True) * g)

    gw_ref = jax.grad(loss_ref)(W)
    gw_pal = jax.grad(loss_pal)(W)
    np.testing.assert_allclose(np.asarray(gw_pal), np.asarray(gw_ref),
                               atol=1e-3)


def test_fused_enc_layer_matches_reference():
    from na_mpnn_tpu.models.modules import enc_layer_apply, gather_nodes
    from na_mpnn_tpu.ops.fused_layers import enc_layer_fused

    params = init_params(jax.random.PRNGKey(3), CFG)
    p = params["encoder"][0]
    batch, X_aug, X_m_aug, X_ref = _geom(L=48)
    _, E_idx = knn_graph(X_ref, batch["mask"], 32)
    B, L, K = E_idx.shape
    h_V = jax.random.normal(jax.random.PRNGKey(4), (B, L, 128))
    h_E = jax.random.normal(jax.random.PRNGKey(5), (B, L, K, 128))
    mask = batch["mask"].astype(jnp.float32)
    mask_attend = mask[:, :, None] * gather_nodes(mask[..., None], E_idx)[..., 0]

    ref_V, ref_E = enc_layer_apply(p, h_V, h_E, E_idx, mask, mask_attend)
    out_V, out_E = enc_layer_fused(p, h_V, h_E, E_idx, mask, mask_attend,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out_V), np.asarray(ref_V), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_E), np.asarray(ref_E), atol=2e-5)


def _forward_pallas_interpret(batch, order, params, L):
    import dataclasses
    import na_mpnn_tpu.ops as ops
    from na_mpnn_tpu.models import forward

    old = ops.INTERPRET
    ops.INTERPRET = True
    try:
        cfg = dataclasses.replace(CFG, kernels="pallas")
        lp, _ = forward(params, cfg, {**batch, "decoding_order": order})
    finally:
        ops.INTERPRET = old
    return lp


def test_fused_forward_full_model_interpret():
    """Full deterministic forward on the Pallas kernel path (interpret mode,
    L % 16 == 0 -> in-kernel table gathers) vs the XLA path."""
    from na_mpnn_tpu.models import forward

    batch, _, _, _ = _geom(L=48)
    L = 48
    order = jnp.tile(jnp.arange(L)[None], (2, 1))
    params = init_params(jax.random.PRNGKey(6), CFG)
    ref_lp, _ = forward(params, CFG, {**batch, "decoding_order": order})
    fused_lp = _forward_pallas_interpret(batch, order, params, L)
    np.testing.assert_allclose(np.asarray(fused_lp), np.asarray(ref_lp),
                               atol=5e-4)


def test_fused_forward_fallback_path_interpret():
    """L % 16 != 0 falls back to the pre-gathered fused kernels — same
    result as the XLA path."""
    from na_mpnn_tpu.models import forward

    batch, _, _, _ = _geom(L=40)
    L = 40
    order = jnp.tile(jnp.arange(L)[None], (2, 1))
    params = init_params(jax.random.PRNGKey(8), CFG)
    ref_lp, _ = forward(params, CFG, {**batch, "decoding_order": order})
    fused_lp = _forward_pallas_interpret(batch, order, params, L)
    np.testing.assert_allclose(np.asarray(fused_lp), np.asarray(ref_lp),
                               atol=5e-4)
