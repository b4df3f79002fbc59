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

Training support (replaces the reference's only recourse for big structures —
spatial cropping, na_data_utils.py:1037-1071): coordinate noise and dropout
are generated *per global row* by folding the row id into the PRNG key
(`jax.random.fold_in`), so the random stream each residue sees is a function
of (key, row) only — independent of how L is partitioned. Loss and gradients
are therefore bitwise-stable across graph-axis sizes (a (data, graph=G) mesh
matches G=1 exactly, up to collective reduction order), which is the
correctness contract test_graph_parallel verifies. Layers are rematerialized
(jax.checkpoint) like the single-device training path.

Numerics are identical to models.forward in deterministic mode: every shard
computes exactly the rows it owns with global neighbor data.
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

# Tags folding the random-stream role into the per-row key (any fixed
# distinct ints).
_TAG_NOISE = 101
_TAG_ENC = 200    # + 10 * layer + slot
_TAG_DEC = 500    # + 10 * layer + slot


def _ag(x, axis=1):
    """All-gather local L-rows into the global array along `axis`."""
    return jax.lax.all_gather(x, GRAPH_AXIS, axis=axis, tiled=True)


def _knn_local_rows(X_ref_local, X_ref_global, mask_local, mask_global, k,
                    key_chunk: int = 0):
    """Masked kNN for the shard's query rows against all global keys —
    the row-wise restriction of features.knn_graph (identical semantics).

    With ``key_chunk > 0`` the [B, Ls, L] distance matrix is never
    materialized: keys are streamed in chunks of that size through a
    running top-k merge (two fori_loop passes — one for the row max that
    anchors the masked-tie contract, one for the merge), so per-shard
    memory is O(Ls * key_chunk). Selection is identical to the one-shot
    path: concat order keeps earlier-chunk candidates ahead of later ones,
    so top_k's stable lowest-index tie-breaking is preserved globally."""
    Lg = X_ref_global.shape[1]
    k_eff = min(k, Lg)
    mask_q = mask_local.astype(X_ref_local.dtype)
    if key_chunk <= 0 or key_chunk >= Lg:
        mask_k = mask_global.astype(X_ref_local.dtype)
        m2 = mask_q[:, :, None] * mask_k[:, None, :]
        dX = X_ref_local[:, :, None, :] - X_ref_global[:, None, :, :]
        D = m2 * jnp.sqrt(jnp.sum(dX * dX, axis=-1) + 1e-6)
        D_max = jnp.max(D, axis=-1, keepdims=True)
        D_adjust = D + (1.0 - m2) * D_max
        neg, E_idx = jax.lax.top_k(-D_adjust, k_eff)
        return -neg, E_idx

    C = int(key_chunk)
    nchunk = -(-Lg // C)
    pad = nchunk * C - Lg
    Xg = jnp.pad(X_ref_global, ((0, 0), (0, pad), (0, 0)))
    mg = jnp.pad(mask_global.astype(X_ref_local.dtype), ((0, 0), (0, pad)))

    def chunk_D(c):
        Xc = jax.lax.dynamic_slice_in_dim(Xg, c * C, C, axis=1)
        mc = jax.lax.dynamic_slice_in_dim(mg, c * C, C, axis=1)
        m2 = mask_q[:, :, None] * mc[:, None, :]
        dX = X_ref_local[:, :, None, :] - Xc[:, None, :, :]
        return m2 * jnp.sqrt(jnp.sum(dX * dX, axis=-1) + 1e-6), m2

    # Pass 1: the per-row max of masked distances (the tie value every
    # masked/padded key takes, exactly as in the one-shot path).
    def max_body(c, best):
        D, _ = chunk_D(c)
        return jnp.maximum(best, jnp.max(D, axis=-1))

    D_max = jax.lax.fori_loop(
        0, nchunk, max_body,
        jnp.zeros(mask_q.shape, X_ref_local.dtype))[..., None]

    # Pass 2: streamed top-k merge on -D_adjust.
    best_neg0 = jnp.full(mask_q.shape + (k_eff,), -jnp.inf,
                         X_ref_local.dtype)
    best_idx0 = jnp.zeros(mask_q.shape + (k_eff,), jnp.int32)

    def merge_body(c, carry):
        best_neg, best_idx = carry
        D, m2 = chunk_D(c)
        neg = -(D + (1.0 - m2) * D_max)
        cols = (c * C + jnp.arange(C, dtype=jnp.int32))
        cols = jnp.broadcast_to(cols, neg.shape)
        cand_neg = jnp.concatenate([best_neg, neg], axis=-1)
        cand_idx = jnp.concatenate([best_idx, cols], axis=-1)
        new_neg, pos = jax.lax.top_k(cand_neg, k_eff)
        new_idx = jnp.take_along_axis(cand_idx, pos, axis=-1)
        return new_neg, new_idx

    best_neg, best_idx = jax.lax.fori_loop(0, nchunk, merge_body,
                                           (best_neg0, best_idx0))
    # Padded tail columns (index >= Lg) can only appear when a row has
    # fewer than k valid keys; clamp them to a real index like the
    # mode="clip" gathers downstream expect.
    best_idx = jnp.minimum(best_idx, Lg - 1)
    return -best_neg, best_idx


def _gather_global(nodes_global, E_idx):
    """nodes [B, L, C] at global indices [B, Ls, K] -> [B, Ls, K, C]."""
    return gather_nodes(nodes_global, E_idx)


# ---------------------------------------------------------------------------
# Partition-invariant randomness: one PRNG stream per (key, tag, global row)
# ---------------------------------------------------------------------------

def _row_keys(key, tag, rid):
    """Per-row keys from the global row ids rid [B, Ls] -> [B*Ls] keys."""
    k = jax.random.fold_in(key, tag)
    return jax.vmap(lambda r: jax.random.fold_in(k, r))(rid.reshape(-1))


def _row_normal(key, tag, rid, row_shape, dtype=jnp.float32):
    ks = _row_keys(key, tag, rid)
    out = jax.vmap(lambda kk: jax.random.normal(kk, row_shape, dtype))(ks)
    return out.reshape(rid.shape + row_shape)


def _row_dropout(x, rate, key, tag, rid):
    """Dropout on x [B, Ls, ...] with a per-global-row random stream."""
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    ks = _row_keys(key, tag, rid)
    row_shape = x.shape[2:]
    m = jax.vmap(lambda kk: jax.random.bernoulli(kk, keep, row_shape))(ks)
    m = m.reshape(x.shape)
    return jnp.where(m, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Local (per-shard) model
# ---------------------------------------------------------------------------

def _features_local(p, cfg: ModelConfig, lb, key=None):
    """Row-local featurization with globally-gathered neighbor data."""
    from ..models.features import _use_pallas_kernels

    X = jnp.asarray(lb["X"])  # keep the caller's dtype (f64 parity tests)
    if key is not None and (cfg.protein_augment_eps > 0 or cfg.dna_augment_eps > 0
                            or cfg.rna_augment_eps > 0):
        eps = (lb["protein_mask"] * cfg.protein_augment_eps
               + lb["dna_mask"] * cfg.dna_augment_eps
               + lb["rna_mask"] * cfg.rna_augment_eps).astype(X.dtype)
        noise = _row_normal(key, _TAG_NOISE, lb["rid"], X.shape[2:], X.dtype)
        X = X + lb["X_m"][:, :, :, None].astype(X.dtype) * eps[:, :, None, None] * noise

    X_aug, X_m_aug, X_ref = build_augmented_atoms(X, lb["X_m"], lb, cfg)
    X_ref_g = _ag(X_ref)
    mask_g = _ag(lb["mask"])
    use_pallas = _use_pallas_kernels(cfg)
    if use_pallas:
        from ..ops import interpret_mode
        from ..ops.knn import knn_graph_pallas_qk
        _, E_idx = knn_graph_pallas_qk(X_ref, X_ref_g, lb["mask"], mask_g,
                                       cfg.k_neighbors,
                                       interpret=interpret_mode())
    else:
        _, E_idx = _knn_local_rows(X_ref, X_ref_g, lb["mask"], mask_g,
                                   cfg.k_neighbors,
                                   key_chunk=cfg.gp_knn_key_chunk)

    X_aug_g = _ag(X_aug)
    X_m_aug_g = _ag(X_m_aug)
    # All-pair-atom RBF with local query rows and globally indexed neighbors:
    B, Ls, A, _ = X_aug.shape
    K = E_idx.shape[2]
    n_pos = cfg.num_positional_embeddings
    W = p["edge_embedding"]["w"]
    if use_pallas:
        # Pallas fused RBF+projection on (local query, gathered global
        # neighbor) coordinate planes — class-specialized when configured.
        from ..ops import interpret_mode
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if cfg.rbf_mode == "classed":
            from ..ops.rbf_classed import rbf_edge_features_classed_qk
            E_rbf = rbf_edge_features_classed_qk(
                X_aug, X_m_aug, X_aug_g, X_m_aug_g, E_idx, W[n_pos:],
                compute_dtype=cdt, interpret=interpret_mode())
        else:
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

            sg = jax.lax.stop_gradient
            E_rbf = _rbf_proj(sg(pad(Xi)), sg(pad(Xj)), sg(pad(Mi)), sg(pad(Mj)),
                              permute_rbf_weight(W[n_pos:]).astype(jnp.float32),
                              cdt, interpret_mode())[:E_flat].reshape(B, Ls, K, -1)
    else:
        def _rbf_rows(Xa_rows, Xm_rows, E_idx_rows):
            """E_rbf for a block of query rows: gather neighbors, RBF-embed
            the A x A distance grid, project through W — the [rows, K,
            A^2*num_rbf] block lives only within this call."""
            rows = Xa_rows.shape[1]
            Xg = _gather_global(X_aug_g.reshape(B, -1, A * 3),
                                E_idx_rows).reshape(B, rows, K, A, 3)
            d = Xa_rows[:, :, None, :, None, :] - Xg[:, :, :, None, :, :]
            D = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-6)
            RBF = rbf_embed(D, cfg.num_rbf)
            Mg = _gather_global(X_m_aug_g, E_idx_rows)
            RBF = RBF * Xm_rows[:, :, None, :, None, None] \
                * Mg[:, :, :, None, :, None]
            return jnp.dot(RBF.reshape(B, rows, K, A * A * cfg.num_rbf),
                           W[n_pos:])

        Cr = cfg.gp_rbf_row_chunk
        if Cr <= 0 or Cr >= Ls:
            E_rbf = _rbf_rows(X_aug, X_m_aug, E_idx)
        else:
            pad_r = (-Ls) % Cr
            nch = (Ls + pad_r) // Cr

            def pad_rows(x):
                return jnp.pad(x, ((0, 0), (0, pad_r)) + ((0, 0),) * (x.ndim - 2))

            xa = pad_rows(X_aug).reshape(B, nch, Cr, A, 3).swapaxes(0, 1)
            xm = pad_rows(X_m_aug).reshape(B, nch, Cr, A).swapaxes(0, 1)
            ei = pad_rows(E_idx).reshape(B, nch, Cr, K).swapaxes(0, 1)
            E_rbf = jax.lax.map(
                lambda t: _rbf_rows(*t), (xa, xm, ei)
            ).swapaxes(0, 1).reshape(B, Ls + pad_r, K, -1)[:, :Ls]

    R_idx_g = _ag(lb["R_idx"].astype(jnp.int32))
    cl_g = _ag(lb["chain_labels"].astype(jnp.int32))
    offset = lb["R_idx"].astype(jnp.int32)[:, :, None] - \
        _gather_global(R_idx_g[..., None], E_idx)[..., 0]
    E_chains = (lb["chain_labels"].astype(jnp.int32)[:, :, None] ==
                _gather_global(cl_g[..., None], E_idx)[..., 0]).astype(jnp.int32)
    E_positional = positional_embed(p["positional"], offset, E_chains,
                                    cfg.max_relative_feature)

    E = jnp.dot(E_positional, W[:n_pos]) + E_rbf
    E = layer_norm(p["norm_edges"], E)

    V = jax.nn.one_hot(lb["R_polymer_type"], cfg.num_polytypes,
                       dtype=p["node_embedding"]["w"].dtype)
    V = layer_norm(p["norm_nodes"], linear(p["node_embedding"], V))
    return V, E, E_idx


def _enc_layer_local(p, h_V, h_E, E_idx, mask, mask_attend, rate, key, rid,
                     tag):
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
    h_V = layer_norm(p["norm1"], h_V + _row_dropout(dh, rate, key, tag, rid))
    dh = pff_apply(p["dense"], h_V)
    h_V = layer_norm(p["norm2"], h_V + _row_dropout(dh, rate, key, tag + 1, rid))
    h_V = mask[..., None] * h_V

    h_message = edge_message(h_V, "W11", "W12", "W13")
    h_E = layer_norm(p["norm3"],
                     h_E + _row_dropout(h_message, rate, key, tag + 2, rid))
    return h_V, h_E


def _dec_layer_local(lp, h_V, h_E, E_idx, mask, mask_1d, mask_bw, mask_fw,
                     h_S, h_V_enc, rate, key, rid, tag):
    H = h_V.shape[-1]
    (wa, wb, ws, wv), b1 = _split_w1(lp, H)
    e_term = mask_1d * jnp.dot(h_E, wb)
    # One all_gather + one neighbor gather for all three node terms
    # (mirrors models.mpnn.edge_context; 3x fewer collectives per layer).
    nodes3 = jnp.concatenate(
        [jnp.dot(h_S, ws), jnp.dot(h_V, wv), jnp.dot(h_V_enc, wv)], axis=-1)
    g = _gather_global(_ag(nodes3), E_idx)
    ctx = (mask_bw * (g[..., :H] + g[..., H:2 * H])
           + mask_fw * g[..., 2 * H:])
    x = jnp.dot(h_V, wa)[:, :, None, :] + ctx + e_term + b1
    h_message = _message_tail(lp, x)
    dh = jnp.sum(h_message, axis=-2) / 30.0
    h_V = layer_norm(lp["norm1"], h_V + _row_dropout(dh, rate, key, tag, rid))
    dh = pff_apply(lp["dense"], h_V)
    h_V = layer_norm(lp["norm2"], h_V + _row_dropout(dh, rate, key, tag + 1, rid))
    return mask[..., None] * h_V


def _encode_local(params, cfg: ModelConfig, lb, key, rate):
    """Features + encoder stack on the shard's rows -> (h_V, h_E, E_idx,
    mask). `key` is None for deterministic (inference) encode."""
    mask = lb["mask"].astype(jnp.float32)
    rid = lb["rid"]
    V, E, E_idx = _features_local(params["features"], cfg, lb, key)
    h_V = linear(params["W_v"], V)
    h_E = linear(params["W_e"], E)

    mask_g = _ag(mask)
    mask_attend = mask[:, :, None] * _gather_global(mask_g[..., None], E_idx)[..., 0]

    enc = _enc_layer_local
    if key is not None:
        enc = jax.checkpoint(enc, static_argnums=(6, 9))
    for i, lp in enumerate(params["encoder"]):
        h_V, h_E = enc(lp, h_V, h_E, E_idx, mask, mask_attend, rate, key, rid,
                       _TAG_ENC + 10 * i)
    return h_V, h_E, E_idx, mask


def _forward_local(params, cfg: ModelConfig, deterministic, lb, key):
    """Full forward for the shard's rows; `key` carries the (replicated)
    training RNG or None in deterministic mode."""
    if deterministic:
        key = None
    rid = lb["rid"]
    rate = cfg.dropout if not deterministic else 0.0
    h_V, h_E, E_idx, mask = _encode_local(params, cfg, lb, key, rate)

    dec = _dec_layer_local
    if not deterministic:
        dec = jax.checkpoint(dec, static_argnums=(10, 13))

    # Decode-order causal masks: ranks are global; compare per local edge.
    rank_local = lb["decode_rank"]
    rank_g = _ag(rank_local)
    rank_j = _gather_global(rank_g[..., None], E_idx)[..., 0]
    attend = (rank_j < rank_local[:, :, None]).astype(jnp.float32)[..., None]
    mask_1d = mask[:, :, None, None]
    mask_bw = mask_1d * attend
    mask_fw = mask_1d * (1.0 - attend)

    h_S = params["W_s"]["emb"][lb["S"]]
    h_V_enc = h_V
    for i, lp in enumerate(params["decoder"]):
        h_V = dec(lp, h_V, h_E, E_idx, mask, mask_1d, mask_bw, mask_fw, h_S,
                  h_V_enc, rate, key, rid, _TAG_DEC + 10 * i)

    logits = linear(params["W_out"], h_V)
    return jax.nn.log_softmax(logits, axis=-1)


def forward_graph_parallel(params, cfg: ModelConfig, batch, mesh: Mesh,
                           decoding_order: Optional[jax.Array] = None,
                           key: Optional[jax.Array] = None,
                           deterministic: bool = True):
    """Teacher-forced forward with L sharded over the mesh "graph" axis and
    B over "data". Returns log_probs [B, L, num_letters] with the same
    sharding.

    Deterministic mode: identical rows to models.forward given the same
    decoding order. Training mode (deterministic=False, key given): applies
    per-polymer coordinate noise and dropout with partition-invariant per-row
    streams, and draws the decoding order from `key` if none is given.
    """
    B, L = batch["S"].shape
    if key is not None:
        key_order, key_layers = jax.random.split(key)
    else:
        key_order = key_layers = None
    if decoding_order is None:
        if deterministic or key is None:
            decoding_order = jnp.tile(jnp.arange(L, dtype=jnp.int32)[None], (B, 1))
        else:
            from ..models.mpnn import sample_decoding_order
            chain_M = batch["mask"].astype(jnp.float32)
            if cfg.decode_protein_first:
                chain_M = chain_M * (1.0 - batch["protein_mask"].astype(jnp.float32))
            decoding_order = sample_decoding_order(key_order, chain_M)
    # Global decode rank, computed once (consistent across shards).
    rank = jnp.argsort(decoding_order, axis=-1).astype(jnp.int32)

    keys = ["X", "X_m", "mask", "S", "R_idx", "chain_labels",
            "protein_mask", "dna_mask", "rna_mask", "R_polymer_type"]
    lb = {k: batch[k] for k in keys}
    lb["decode_rank"] = rank
    # Global row ids: the per-row RNG stream identity (partition-invariant).
    lb["rid"] = jnp.arange(B * L, dtype=jnp.int32).reshape(B, L)

    specs = {k: P("data", GRAPH_AXIS) for k in lb}

    if key_layers is None:
        key_layers = jax.random.PRNGKey(0)  # unused in deterministic mode

    fn = shard_map(
        partial(_forward_local, params, cfg, deterministic or key is None),
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P("data", GRAPH_AXIS),
        check_vma=False,
    )
    lb = {k: jax.device_put(v, NamedSharding(mesh, P("data", GRAPH_AXIS)))
          for k, v in lb.items()}
    return fn(lb, key_layers)


# ---------------------------------------------------------------------------
# Edge-partitioned autoregressive sampling
# ---------------------------------------------------------------------------

def _sample_local(params, cfg, B, temperature, has_pair, lb, S_true,
                  chain_mask_b, decoding_order, rank, bias, step_keys,
                  pair_arrays):
    """Shard-local body of sample_graph_parallel.

    Encode + the static neighbor context rows (the O(L*K*H) memory/FLOP
    bulk) are computed on the shard's rows only, and EVERY O(L) piece of
    decode state stays sharded too (VERDICT r3 item 5): the scan carry
    holds only the shard's own rows of h_V_stack / h_S / the probability
    accumulators — per-shard memory is O(Ls*H), so ribosome-scale graphs
    decode without any replicated [n_dec+1, B, L, H] stack. Each step pays
    two psums: the decoded position's own rows (static [K, 2H] context +
    encoder h_V), and its K neighbors' dynamic rows (h_S + the n_dec
    h_V_stack levels) — O(B*K*H*(n_dec+3)) per step, riding ICI on
    hardware. The sequential per-step math (decoder layers on one position,
    the token draw) is replicated on every shard from the psum results —
    same keys, same values — so S and the scalar outputs stay replicated
    by construction, exactly matching models.mpnn.sample token-for-token
    (reference sampling loop: inference/model_utils.py:164-216).
    """
    from ..models.mpnn import _OMIT_ALWAYS, _pair_bias_step, embed_tokens
    from ..models.modules import dec_layer_apply

    h_V_l, h_E_l, E_idx_l, mask_l = _encode_local(params, cfg, lb, None, 0.0)
    H = h_V_l.shape[-1]
    K = E_idx_l.shape[-1]
    L = decoding_order.shape[-1]
    Ls = h_V_l.shape[1]
    nl = bias.shape[-1]
    fdtype = h_V_l.dtype

    mask_g = _ag(mask_l)[0]                    # [L]
    E_idx_g = _ag(E_idx_l)[0]                  # [L, K] (global indices; small)
    # Static per-edge context rows, kept SHARDED: [Ls, K, 2H] =
    # concat(h_E, h_V_enc(j)). The h_S slot of the reference's
    # h_EXV_encoder layout is zero and is re-inserted at use time.
    static_l = jnp.concatenate(
        [h_E_l, _gather_global(_ag(h_V_l)[0:1], E_idx_l)], axis=-1)[0]

    n_dec = cfg.num_decoder_layers
    omit = jnp.zeros((nl,), fdtype).at[jnp.asarray(_OMIT_ALWAYS)].set(1.0)
    my = jax.lax.axis_index(GRAPH_AXIS)
    b_idx = jnp.arange(B)
    mask_b = jnp.broadcast_to(mask_g, (B, L))
    bias = bias.astype(fdtype)

    # Shard-local decode state: this shard's Ls rows only.
    h_V0_lb = jnp.broadcast_to(h_V_l[0], (B, Ls, H)).astype(fdtype)
    init_carry = {
        "h_V_stack": jnp.concatenate(
            [h_V0_lb[None], jnp.zeros((n_dec, B, Ls, H), fdtype)], axis=0),
        "h_S": jnp.zeros((B, Ls, H), fdtype),
        "S": jnp.full((B, L), nl - 1, jnp.int32),
        "all_probs": jnp.zeros((B, Ls, nl), fdtype),
        "all_log_probs": jnp.zeros((B, Ls, nl), fdtype),
    }

    def step(carry, inp):
        t_step, skey = inp
        t = decoding_order[:, t_step]                     # [B]
        local_t = jnp.clip(t - my * Ls, 0, Ls - 1)
        owned_t = ((t // Ls) == my)                       # [B]
        own_f = owned_t.astype(fdtype)
        h_V_stack = carry["h_V_stack"]

        E_idx_t = E_idx_g[t][:, None]                     # [B,1,K]
        j_glob = E_idx_t[:, 0]                            # [B,K]
        local_j = jnp.clip(j_glob - my * Ls, 0, Ls - 1)
        own_j = ((j_glob // Ls) == my).astype(fdtype)[..., None]

        # ONE fused psum: the decoded position's own rows (static context +
        # encoder h_V) and its K neighbors' dynamic rows (h_S + stack
        # levels 0..n_dec-1) from their owner shards.
        fetched = jax.lax.psum(
            {
                "static": static_l[local_t] * own_f[:, None, None],
                "h_S_j": carry["h_S"][b_idx[:, None], local_j] * own_j,
                "stack_j": (h_V_stack[:n_dec, b_idx[:, None], local_j]
                            * own_j[None]),
                "h_V0_t": h_V_stack[0, b_idx, local_t] * own_f[:, None],
            },
            GRAPH_AXIS)
        rows = fetched["static"]
        h_E_t = rows[..., :H][:, None]                    # [B,1,K,H]
        h_Vj_t = rows[..., H:][:, None]                   # [B,1,K,H]

        rank_t = rank[b_idx, t]
        rank_j = rank[b_idx[:, None], j_glob]             # [B,K]
        attend = (rank_j < rank_t[:, None]).astype(fdtype)
        mask_t = mask_b[b_idx, t]
        mask_bw_t = (mask_t[:, None] * attend)[:, None, :, None]
        mask_fw_t = (mask_t[:, None] * (1.0 - attend))[:, None, :, None]
        h_EXV_t = mask_fw_t * jnp.concatenate(
            [h_E_t, jnp.zeros_like(h_E_t), h_Vj_t], axis=-1)

        chain_mask_t = chain_mask_b[b_idx, t]
        bias_t = bias[b_idx, t]

        h_S_j = fetched["h_S_j"][:, None]                 # [B,1,K,H]
        h_ES_t = jnp.concatenate([h_E_t, h_S_j], axis=-1)

        # Decoder layers on the single position t: the level-l value at t
        # rides a register (h_V_t) — only NEIGHBOR values need the stack.
        h_V_t = fetched["h_V0_t"]
        for l, layer_params in enumerate(params["decoder"]):
            h_Vl_j = fetched["stack_j"][l][:, None]       # [B,1,K,H]
            h_ESV_t = (mask_bw_t * jnp.concatenate([h_ES_t, h_Vl_j], axis=-1)
                       + h_EXV_t)
            out = dec_layer_apply(layer_params, h_V_t[:, None], h_ESV_t,
                                  mask_V=mask_t[:, None])
            # mask_V (f32) promotes the layer output; cast back before the
            # scatter into the stack (same fix as models/mpnn._sample_scan).
            h_V_t = out[:, 0].astype(fdtype)
            prev = h_V_stack[l + 1, b_idx, local_t]
            h_V_stack = h_V_stack.at[l + 1, b_idx, local_t].set(
                jnp.where(owned_t[:, None], h_V_t, prev))

        logits = linear(params["W_out"], h_V_t)
        log_probs = jax.nn.log_softmax(logits, axis=-1)

        total_bias = bias_t
        if has_pair:
            total_bias = total_bias + _pair_bias_step(pair_arrays, t,
                                                      carry["S"])
        probs = jax.nn.softmax((logits + total_bias) / temperature, axis=-1)
        probs = probs * (1.0 - omit)
        probs_sample = probs / jnp.sum(probs, axis=-1, keepdims=True)

        S_t = jax.random.categorical(skey, jnp.log(probs_sample + 1e-30),
                                     axis=-1)
        S_t = jnp.where(chain_mask_t > 0, S_t,
                        S_true[b_idx, t]).astype(jnp.int32)

        def owner_set(acc, val):
            prev = acc[b_idx, local_t]
            return acc.at[b_idx, local_t].set(
                jnp.where(owned_t[:, None], val, prev))

        carry = {
            "h_V_stack": h_V_stack,
            "h_S": owner_set(carry["h_S"],
                             embed_tokens(params, S_t).astype(fdtype)),
            "S": carry["S"].at[b_idx, t].set(S_t),
            "all_probs": owner_set(
                carry["all_probs"],
                (chain_mask_t[:, None] * probs_sample).astype(fdtype)),
            "all_log_probs": owner_set(
                carry["all_log_probs"],
                (chain_mask_t[:, None] * log_probs).astype(fdtype)),
        }
        return carry, None

    carry, _ = jax.lax.scan(step, init_carry,
                            (jnp.arange(L), step_keys))
    return {
        "S": carry["S"],
        "sampling_probs": _ag(carry["all_probs"]),
        "log_probs": _ag(carry["all_log_probs"]),
        "decoding_order": decoding_order,
    }


def sample_graph_parallel(params, cfg: ModelConfig, batch, key, mesh: Mesh,
                          num_samples: int = 1, temperature=0.1, bias=None,
                          pair_bias_ctx=None):
    """Autoregressive sampling with L sharded over the mesh "graph" axis.

    Same contract and RNG stream as models.mpnn.sample (one structure in
    batch; decode batch = num_samples), so outputs match the single-device
    sampler given the same key. The encoder pass and the [L, K, 2H] static
    decoder context — the only O(L*K) memory in sampling, the reason large
    structures need partitioning at all — live sharded; the sequential
    decode keeps the small [n_dec+1, L, H] node stack replicated and pays
    one [K, 2H]-row psum per step (rides ICI on hardware).
    """
    B = num_samples
    L = batch["S"].shape[-1]
    nl = cfg.num_letters

    key_order, key_steps = jax.random.split(key)
    mask_full = jnp.asarray(batch["mask"][0:1]).astype(jnp.float32)
    chain_mask = mask_full * jnp.asarray(
        batch["chain_mask"][0:1]).astype(jnp.float32)
    chain_mask_b = jnp.broadcast_to(chain_mask[0], (B, L))
    if "decoding_order" in batch:
        decoding_order = jnp.broadcast_to(
            batch["decoding_order"], (B, L)).astype(jnp.int32)
    else:
        from ..models.mpnn import sample_decoding_order
        decoding_order = sample_decoding_order(
            key_order, chain_mask_b).astype(jnp.int32)
    rank = jnp.argsort(decoding_order, axis=-1).astype(jnp.int32)
    S_true = jnp.broadcast_to(jnp.asarray(batch["S"])[0],
                              (B, L)).astype(jnp.int32)
    if bias is None:
        bias_b = jnp.zeros((B, L, nl), jnp.float32)
    else:
        bias_b = jnp.broadcast_to(bias, (B, L, nl)).astype(jnp.float32)
    step_keys = jax.random.split(key_steps, L)

    keys = ["X", "X_m", "mask", "R_idx", "chain_labels", "protein_mask",
            "dna_mask", "rna_mask", "R_polymer_type"]
    lb = {k: jnp.asarray(batch[k])[0:1] for k in keys}
    lb["rid"] = jnp.arange(L, dtype=jnp.int32).reshape(1, L)
    specs = {k: P(None, GRAPH_AXIS) for k in lb}

    has_pair = pair_bias_ctx is not None
    if has_pair:
        pair_arrays = {
            "pair_bias_AA": jnp.asarray(pair_bias_ctx["pair_bias_AA"]),
            "u_diag": jnp.asarray(pair_bias_ctx["u_diag"]),
        }
    else:
        pair_arrays = {"pair_bias_AA": jnp.zeros((nl, nl)),
                       "u_diag": jnp.zeros((max(L - 1, 1),))}

    fn = shard_map(
        partial(_sample_local, params, cfg, B, temperature, has_pair),
        mesh=mesh,
        in_specs=(specs, P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    lb = {k: jax.device_put(v, NamedSharding(mesh, P(None, GRAPH_AXIS)))
          for k, v in lb.items()}
    return fn(lb, S_true, chain_mask_b, decoding_order, rank, bias_b,
              step_keys, pair_arrays)
