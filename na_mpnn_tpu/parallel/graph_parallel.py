"""Edge-partitioned (graph-parallel) forward pass over the mesh "graph" axis.

The residue dimension L is sharded contiguously across the "graph" axis with
`shard_map`; every O(L*K*H) edge tensor (RBF features, h_E, per-edge
messages — the memory/FLOP bulk of the model) lives and is computed locally
on its owner shard. Only the O(L*H) node-level arrays cross the interconnect:
one `all_gather` of h_V per message round (node features are ~30x smaller
than edge features at K=32), plus one gather of the tiny coordinate/index
arrays during featurization. Collectives ride the mesh axis (ICI within a
slice); XLA schedules them — this is the halo-exchange design of SURVEY.md
§2.3 with the halo widened to the full (small) node set, which is both
simpler and cheaper than per-boundary bookkeeping at H=128, K=32.

Numerics are identical to models.forward: every shard computes exactly the
rows it owns with global neighbor data.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import ModelConfig
from ..models.features import (build_augmented_atoms, positional_embed,
                               rbf_embed)
from ..models.modules import (_message_tail, _split_w1, gather_nodes,
                              layer_norm, linear, pff_apply)

GRAPH_AXIS = "graph"


def _ag(x, axis=1):
    """All-gather local L-rows into the global array along `axis`."""
    return jax.lax.all_gather(x, GRAPH_AXIS, axis=axis, tiled=True)


def _knn_local_rows(X_ref_local, X_ref_global, mask_local, mask_global, k):
    """Masked kNN for the shard's query rows against all global keys —
    the row-wise restriction of features.knn_graph (identical semantics)."""
    mask_q = mask_local.astype(X_ref_local.dtype)
    mask_k = mask_global.astype(X_ref_local.dtype)
    m2 = mask_q[:, :, None] * mask_k[:, None, :]
    dX = X_ref_local[:, :, None, :] - X_ref_global[:, None, :, :]
    D = m2 * jnp.sqrt(jnp.sum(dX * dX, axis=-1) + 1e-6)
    D_max = jnp.max(D, axis=-1, keepdims=True)
    D_adjust = D + (1.0 - m2) * D_max
    neg, E_idx = jax.lax.top_k(-D_adjust, min(k, X_ref_global.shape[1]))
    return -neg, E_idx


def _gather_global(nodes_global, E_idx):
    """nodes [B, L, C] at global indices [B, Ls, K] -> [B, Ls, K, C]."""
    return gather_nodes(nodes_global, E_idx)


def _features_local(p, cfg: ModelConfig, lb):
    """Row-local featurization with globally-gathered neighbor data."""
    from ..models.features import _use_pallas_kernels

    X = lb["X"].astype(jnp.float32)
    X_aug, X_m_aug, X_ref = build_augmented_atoms(X, lb["X_m"], lb, cfg)
    X_ref_g = _ag(X_ref)
    mask_g = _ag(lb["mask"])
    use_pallas = _use_pallas_kernels(cfg)
    if use_pallas:
        from ..ops.knn import knn_graph_pallas_qk
        _, E_idx = knn_graph_pallas_qk(X_ref, X_ref_g, lb["mask"], mask_g,
                                       cfg.k_neighbors)
    else:
        _, E_idx = _knn_local_rows(X_ref, X_ref_g, lb["mask"], mask_g,
                                   cfg.k_neighbors)

    X_aug_g = _ag(X_aug)
    X_m_aug_g = _ag(X_m_aug)
    # All-pair-atom RBF with local query rows and globally indexed neighbors:
    B, Ls, A, _ = X_aug.shape
    K = E_idx.shape[2]
    n_pos = cfg.num_positional_embeddings
    W = p["edge_embedding"]["w"]
    if use_pallas:
        # Pallas fused RBF+projection on (local query, gathered global
        # neighbor) coordinate planes.
        from ..ops.rbf_edge import (EDGE_TILE, permute_rbf_weight,
                                    _rbf_proj)
        Xp_local = jnp.concatenate([X_aug[..., c] for c in range(3)], axis=-1)
        Xp_global = jnp.concatenate([X_aug_g[..., c] for c in range(3)], axis=-1)
        idx = E_idx.reshape(B, Ls * K)
        Xj = jnp.take_along_axis(Xp_global, idx[..., None], axis=1)
        Mj = jnp.take_along_axis(X_m_aug_g.astype(jnp.float32),
                                 idx[..., None], axis=1)
        Xi = jnp.repeat(Xp_local, K, axis=1)
        Mi = jnp.repeat(X_m_aug.astype(jnp.float32), K, axis=1)
        E_flat = B * Ls * K
        Ep = -(-E_flat // EDGE_TILE) * EDGE_TILE

        def pad(x):
            x = x.reshape(E_flat, x.shape[-1])
            return jnp.pad(x, ((0, Ep - E_flat), (0, 0))) if Ep != E_flat else x

        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        sg = jax.lax.stop_gradient
        E_rbf = _rbf_proj(sg(pad(Xi)), sg(pad(Xj)), sg(pad(Mi)), sg(pad(Mj)),
                          permute_rbf_weight(W[n_pos:]).astype(jnp.float32),
                          cdt, False)[:E_flat].reshape(B, Ls, K, -1)
    else:
        Xg = _gather_global(X_aug_g.reshape(B, -1, A * 3), E_idx).reshape(B, Ls, K, A, 3)
        d = X_aug[:, :, None, :, None, :] - Xg[:, :, :, None, :, :]
        D = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-6)
        RBF = rbf_embed(D, cfg.num_rbf)
        Mg = _gather_global(X_m_aug_g, E_idx)
        RBF = RBF * X_m_aug[:, :, None, :, None, None] * Mg[:, :, :, None, :, None]
        RBF_all = RBF.reshape(B, Ls, K, A * A * cfg.num_rbf)

    R_idx_g = _ag(lb["R_idx"].astype(jnp.int32))
    cl_g = _ag(lb["chain_labels"].astype(jnp.int32))
    offset = lb["R_idx"].astype(jnp.int32)[:, :, None] - \
        _gather_global(R_idx_g[..., None], E_idx)[..., 0]
    E_chains = (lb["chain_labels"].astype(jnp.int32)[:, :, None] ==
                _gather_global(cl_g[..., None], E_idx)[..., 0]).astype(jnp.int32)
    E_positional = positional_embed(p["positional"], offset, E_chains,
                                    cfg.max_relative_feature)

    if not use_pallas:
        E_rbf = jnp.dot(RBF_all, W[n_pos:])
    E = jnp.dot(E_positional, W[:n_pos]) + E_rbf
    E = layer_norm(p["norm_edges"], E)

    V = jax.nn.one_hot(lb["R_polymer_type"], cfg.num_polytypes,
                       dtype=p["node_embedding"]["w"].dtype)
    V = layer_norm(p["norm_nodes"], linear(p["node_embedding"], V))
    return V, E, E_idx


def _enc_layer_local(p, h_V, h_E, E_idx, mask, mask_attend):
    """Encoder layer with all-gathered node features per message round."""
    H = h_V.shape[-1]

    def edge_message(h_V_local, w1, w2, w3):
        (wa, wb, wc), b1 = _split_w1(p, H, w1)
        h_V_g = _ag(jnp.dot(h_V_local, wc))
        x = (jnp.dot(h_V_local, wa)[:, :, None, :] + jnp.dot(h_E, wb)
             + _gather_global(h_V_g, E_idx) + b1)
        return _message_tail(p, x, w2, w3)

    h_message = mask_attend[..., None] * edge_message(h_V, "W1", "W2", "W3")
    dh = jnp.sum(h_message, axis=-2) / 30.0
    h_V = layer_norm(p["norm1"], h_V + dh)
    h_V = layer_norm(p["norm2"], h_V + pff_apply(p["dense"], h_V))
    h_V = mask[..., None] * h_V

    h_message = edge_message(h_V, "W11", "W12", "W13")
    h_E = layer_norm(p["norm3"], h_E + h_message)
    return h_V, h_E


def _forward_local(params, cfg: ModelConfig, lb):
    """Full (deterministic) forward for the shard's rows."""
    mask = lb["mask"].astype(jnp.float32)
    V, E, E_idx = _features_local(params["features"], cfg, lb)
    h_V = linear(params["W_v"], V)
    h_E = linear(params["W_e"], E)

    mask_g = _ag(mask)
    mask_attend = mask[:, :, None] * _gather_global(mask_g[..., None], E_idx)[..., 0]
    for lp in params["encoder"]:
        h_V, h_E = _enc_layer_local(lp, h_V, h_E, E_idx, mask, mask_attend)

    # Decode-order causal masks: ranks are global; compare per local edge.
    rank_local = lb["decode_rank"]
    rank_g = _ag(rank_local)
    rank_j = _gather_global(rank_g[..., None], E_idx)[..., 0]
    attend = (rank_j < rank_local[:, :, None]).astype(jnp.float32)[..., None]
    mask_1d = mask[:, :, None, None]
    mask_bw = mask_1d * attend
    mask_fw = mask_1d * (1.0 - attend)

    h_S = params["W_s"]["emb"][lb["S"]]
    H = h_V.shape[-1]
    h_V_enc = h_V
    for lp in params["decoder"]:
        (wa, wb, ws, wv), b1 = _split_w1(lp, H)
        e_term = mask_1d * jnp.dot(h_E, wb)
        s_term = mask_bw * _gather_global(_ag(jnp.dot(h_S, ws)), E_idx)
        venc_term = mask_fw * _gather_global(_ag(jnp.dot(h_V_enc, wv)), E_idx)
        x = (jnp.dot(h_V, wa)[:, :, None, :]
             + mask_bw * _gather_global(_ag(jnp.dot(h_V, wv)), E_idx)
             + e_term + s_term + venc_term + b1)
        h_message = _message_tail(lp, x)
        dh = jnp.sum(h_message, axis=-2) / 30.0
        h_V = layer_norm(lp["norm1"], h_V + dh)
        h_V = layer_norm(lp["norm2"], h_V + pff_apply(lp["dense"], h_V))
        h_V = mask[..., None] * h_V

    logits = linear(params["W_out"], h_V)
    return jax.nn.log_softmax(logits, axis=-1)


def forward_graph_parallel(params, cfg: ModelConfig, batch, mesh: Mesh,
                           decoding_order: Optional[jax.Array] = None):
    """Teacher-forced forward with L sharded over the mesh "graph" axis and
    B over "data". Returns log_probs [B, L, num_letters] with the same
    sharding. Deterministic (eval) semantics — identical rows to
    models.forward given the same decoding order."""
    B, L = batch["S"].shape
    if decoding_order is None:
        decoding_order = jnp.tile(jnp.arange(L, dtype=jnp.int32)[None], (B, 1))
    # Global decode rank, computed once (consistent across shards).
    rank = jnp.argsort(decoding_order, axis=-1).astype(jnp.int32)

    keys = ["X", "X_m", "mask", "S", "R_idx", "chain_labels",
            "protein_mask", "dna_mask", "rna_mask", "R_polymer_type"]
    lb = {k: batch[k] for k in keys}
    lb["decode_rank"] = rank

    specs = {k: P("data", GRAPH_AXIS) for k in lb}

    fn = shard_map(
        partial(_forward_local, params, cfg),
        mesh=mesh,
        in_specs=(specs,),
        out_specs=P("data", GRAPH_AXIS),
        check_vma=False,
    )
    lb = {k: jax.device_put(v, NamedSharding(mesh, P("data", GRAPH_AXIS)))
          for k, v in lb.items()}
    return fn(lb)
