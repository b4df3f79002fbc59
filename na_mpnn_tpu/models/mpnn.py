"""NA-MPNN model: teacher-forced forward, scoring, and autoregressive sampling.

TPU-native re-design of the reference model (reference na_model_utils.py:519-646
for training forward; inference/model_utils.py:71-424 for encode / sample /
score / unconditional_probs). The key structural departures:

* The O(L^2) decoding-order einsum (reference na_model_utils.py:623-631) is
  replaced by an O(L*K) per-edge decode-rank comparison — identical semantics
  (edge j->i carries sequence info iff j decodes strictly before i).
* The Python per-position sampling loop (reference
  inference/model_utils.py:164-216) becomes a single `lax.scan` over decode
  steps, carrying the per-layer h_V stack; everything jit-compiles once.
* Sampling uses JAX PRNG (`jax.random.categorical`) — a defined RNG contract
  replacing torch.multinomial.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import constants
from .config import ModelConfig
from .modules import (cat_neighbors_nodes, dec_layer_apply, enc_layer_apply,
                      gather_nodes, init_dec_layer, init_enc_layer,
                      init_linear, linear)
from .features import features_apply, init_features

# Token ints zeroed out during sampling (UNK, DX, RX, MAS, PAD);
# reference inference/model_utils.py:199-203.
_OMIT_ALWAYS = [
    constants.RESTYPE_TO_INT["UNK"], constants.RESTYPE_TO_INT["DX"],
    constants.RESTYPE_TO_INT["RX"], constants.RESTYPE_TO_INT["MAS"],
    constants.RESTYPE_TO_INT["PAD"],
]


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(key, cfg: ModelConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6 + cfg.num_encoder_layers + cfg.num_decoder_layers)
    params = {
        "features": init_features(ks[0], cfg, dtype),
        "W_v": init_linear(ks[1], cfg.node_features, cfg.hidden_dim, dtype=dtype),
        "W_e": init_linear(ks[2], cfg.edge_features, cfg.hidden_dim, dtype=dtype),
        # Embedding table [vocab, H] (reference W_s = nn.Embedding).
        "W_s": {"emb": jax.random.normal(ks[3], (cfg.vocab, cfg.hidden_dim), dtype)},
        "W_out": init_linear(ks[4], cfg.hidden_dim, cfg.num_letters, dtype=dtype),
        "encoder": [
            init_enc_layer(ks[5 + i], cfg.hidden_dim, cfg.hidden_dim * 2, dtype)
            for i in range(cfg.num_encoder_layers)
        ],
        "decoder": [
            init_dec_layer(ks[5 + cfg.num_encoder_layers + i], cfg.hidden_dim,
                           cfg.hidden_dim * 3, dtype)
            for i in range(cfg.num_decoder_layers)
        ],
    }
    return params


def embed_tokens(p, S):
    return jnp.asarray(p["W_s"]["emb"])[S]


# ---------------------------------------------------------------------------
# Decode-order machinery
# ---------------------------------------------------------------------------

def sample_decoding_order(key, chain_mask):
    """Random decode order: ascending argsort of (chain_mask+1e-4)*|randn| —
    fixed (chain_mask==0) positions decode first (reference
    na_model_utils.py:623)."""
    randn = jax.random.normal(key, chain_mask.shape)
    return jnp.argsort((chain_mask + 0.0001) * jnp.abs(randn), axis=-1)


def decode_rank(decoding_order):
    """rank[i] = time step at which position i decodes (inverse permutation)."""
    return jnp.argsort(decoding_order, axis=-1)


def autoregressive_edge_masks(decoding_order, E_idx, mask):
    """Per-edge causal masks from the decode order.

    mask_bw[b,i,k,0] = 1 iff neighbor j = E_idx[b,i,k] decodes strictly before
    i (sequence-context edges); mask_fw = complementary (encoder-only edges).
    Replaces the reference O(L^2) one-hot/triu einsum
    (na_model_utils.py:624-631) with an O(L*K) rank comparison.
    """
    from .modules import take_rows
    rank = decode_rank(decoding_order)  # [B,L]
    # Gather through a 2-column table: XLA's scalar ([B,L]) gather lowering
    # serializes at ~1.4 ms per call at training shapes, while row gathers
    # with a trailing dim >= 2 take the fast vectorized path (~0.2 ms).
    rank_f = rank.astype(jnp.float32)  # exact: rank < L << 2^24
    rank_j = take_rows(jnp.stack([rank_f, rank_f], axis=-1), E_idx)[..., 0]
    attend = (rank_j < rank_f[:, :, None]).astype(jnp.float32)[..., None]  # [B,L,K,1]
    mask_1d = mask.astype(jnp.float32)[:, :, None, None]
    return mask_1d * attend, mask_1d * (1.0 - attend)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encode(params, cfg: ModelConfig, batch, key: Optional[jax.Array] = None,
           deterministic: bool = True):
    """Features + encoder stack -> (h_V [B,L,H], h_E [B,L,K,H], E_idx).

    Mirrors reference encode (inference/model_utils.py:71-99) /
    the first half of forward (na_model_utils.py:596-608).
    """
    if key is not None:
        key_feat, key_layers = jax.random.split(key)
        layer_keys = jax.random.split(key_layers, cfg.num_encoder_layers)
    else:
        key_feat, layer_keys = None, [None] * cfg.num_encoder_layers

    mask = batch["mask"].astype(jnp.float32)
    # mask_attend rides the featurizer's packed scalar gather (a standalone
    # [B,L] scalar gather serializes at ~1.4 ms on TPU; see features_apply).
    V, E, E_idx, mask_attend = features_apply(params["features"], cfg, batch,
                                              key_feat, deterministic)
    h_V = linear(params["W_v"], V)
    h_E = linear(params["W_e"], E)

    if cfg.compute_dtype == "bfloat16":
        # bf16 trunk: halves activation traffic through the MPNN layers;
        # layer-norm statistics stay fp32 (modules.layer_norm).
        params = {**params,
                  "encoder": jax.tree.map(
                      lambda x: jnp.asarray(x).astype(jnp.bfloat16)
                      if jnp.asarray(x).dtype == jnp.float32 else x,
                      params["encoder"])}
        h_V = h_V.astype(jnp.bfloat16)
        h_E = h_E.astype(jnp.bfloat16)
        mask = mask.astype(jnp.bfloat16)
        mask_attend = mask_attend.astype(jnp.bfloat16)

    def run_layer(layer_params, h_V, h_E, lkey):
        return enc_layer_apply(layer_params, h_V, h_E, E_idx, mask, mask_attend,
                               cfg.dropout, lkey, deterministic)

    if _use_fused_layers(cfg):
        from ..ops.message_kernels import table_gather_ok
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        B, L = mask.shape
        if deterministic and not table_gather_ok(B, L):
            from ..ops import interpret_mode
            from ..ops.fused_layers import enc_layer_fused
            for layer_params in params["encoder"]:
                h_V, h_E = enc_layer_fused(layer_params, h_V, h_E, E_idx, mask,
                                           mask_attend, compute_dtype=cdt,
                                           interpret=interpret_mode())
            return h_V, h_E, E_idx
        if table_gather_ok(B, L):
            # Flat-edge path (train AND eval): edge tensors stay [N*K, H]
            # across the whole stack; dropout + norms/FFN in XLA. Under
            # training, jax.checkpoint wraps each layer: the XLA tail
            # (dropout masks, norms, FFN, edge residual) would otherwise
            # pin ~300MB/layer of residuals — measured 40x slower on-relay
            # without the remat. The policy keeps the kernel OUTPUTS (incl.
            # the saved pre-GELU activations x) so the backward pass never
            # re-runs the forward kernels.
            N, K = B * L, E_idx.shape[2]
            H = h_V.shape[-1]
            h_E2 = h_E.reshape(N * K, H)
            mask_att2 = mask_attend.reshape(N * K, 1).astype(h_V.dtype)
            from ..ops.message_kernels import _flat_eidx
            eidx2 = _flat_eidx(E_idx)
            if deterministic:
                for layer_params in params["encoder"]:
                    h_V, h_E2 = _enc_layer_train_fused(
                        layer_params, h_V, h_E2, mask_att2, None, 0.0, cdt,
                        eidx2, mask, L)
            elif cfg.remat == "none":
                for i, layer_params in enumerate(params["encoder"]):
                    h_V, h_E2 = _enc_layer_train_fused(
                        layer_params, h_V, h_E2, mask_att2, layer_keys[i],
                        cfg.dropout, cdt, eidx2, mask, L)
            else:
                policy = jax.checkpoint_policies.save_only_these_names(
                    "msg_kernel_out")
                ckpt_layer = jax.checkpoint(_enc_layer_train_fused,
                                            static_argnums=(5, 6, 9),
                                            policy=policy)
                for i, layer_params in enumerate(params["encoder"]):
                    h_V, h_E2 = ckpt_layer(
                        layer_params, h_V, h_E2, mask_att2, layer_keys[i],
                        cfg.dropout, cdt, eidx2, mask, L)
            return h_V, h_E2.reshape(B, L, K, H), E_idx
        # Training at a non-bucketed shape: plain XLA layers below.

    for i, layer_params in enumerate(params["encoder"]):
        if not deterministic and cfg.remat != "none":
            # Rematerialize each encoder layer during training: trades FLOPs
            # for HBM exactly like the reference's per-layer
            # torch.utils.checkpoint (na_model_utils.py:606).
            h_V, h_E = jax.checkpoint(run_layer)(layer_params, h_V, h_E, layer_keys[i])
        else:
            h_V, h_E = run_layer(layer_params, h_V, h_E, layer_keys[i])
    return h_V, h_E, E_idx


def _enc_layer_train_fused(p, h_V, h_E2, mask_att2, key, rate, cdt, eidx2,
                           mask, L):
    """Encoder layer for training on the Pallas message kernels: same math as
    modules.enc_layer_apply (node update + edge update) with the edge-message
    MLPs in ops.message_kernels (differentiable custom VJP).

    Edge tensors ride FLAT [N*K, H] end-to-end (h_E2, mask_att2, eidx2):
    the [B,L,K,H] form never exists between featurization and the decoder,
    which removes the relayout copies XLA otherwise inserts around every
    kernel call (~3 ms/step profiled at the 6000-token shape)."""
    from .modules import dropout, layer_norm, pff_apply
    from ..ops import interpret_mode
    from jax.ad_checkpoint import checkpoint_name
    from ..ops.message_kernels import (message_agg_table_flat,
                                       message_edge_table_flat)

    interp = interpret_mode()
    if key is not None:
        k1, k2, k3 = jax.random.split(key, 3)
    else:
        k1 = k2 = k3 = None
    B = mask.shape[0]
    H = h_V.shape[-1]
    N = B * L
    K = h_E2.shape[0] // N
    deterministic = key is None

    h_V2 = h_V.reshape(N, H)
    wc = p["W1"]["w"][2 * H:]
    dh = message_agg_table_flat(p, h_V2, h_E2, jnp.dot(h_V2, wc), eidx2,
                                mask_att2, K=K, L=L, compute_dtype=cdt,
                                interpret=interp)
    dh = checkpoint_name(dh.reshape(B, L, H), "msg_kernel_out")
    h_V = layer_norm(p["norm1"], h_V + dropout(dh, rate, k1, deterministic))
    dh = pff_apply(p["dense"], h_V)
    h_V = layer_norm(p["norm2"], h_V + dropout(dh, rate, k2, deterministic))
    h_V = mask[..., None] * h_V

    h_V2 = h_V.reshape(N, H)
    wc11 = p["W11"]["w"][2 * H:]
    m = message_edge_table_flat(p, h_V2, h_E2, jnp.dot(h_V2, wc11), eidx2,
                                K=K, L=L, compute_dtype=cdt, interpret=interp)
    m = checkpoint_name(m, "msg_kernel_out")
    h_E2 = layer_norm(p["norm3"], h_E2 + dropout(m, rate, k3, deterministic))
    return h_V, h_E2


def _use_fused_layers(cfg: ModelConfig) -> bool:
    from .features import _use_pallas_kernels
    return _use_pallas_kernels(cfg)


# ---------------------------------------------------------------------------
# Teacher-forced decode (training forward & scoring)
# ---------------------------------------------------------------------------

def _decoder_parallel(params, cfg, h_V, h_E, E_idx, mask, h_S, mask_bw, mask_fw,
                      layer_keys, deterministic):
    """Parallel (teacher-forced) decoder: known positions see sequence-embedded
    edges, future positions see encoder-only edges
    (reference na_model_utils.py:632-639).

    The per-layer input cat(h_Vi, h_E, h_Sj, h_Vj)@W1 with the causal mixing
      h_ESV = mask_bw*cat(h_E, h_Sj, h_Vcur_j) + mask_fw*cat(h_E, 0, h_Venc_j)
    is split algebraically per block (scalar masks commute with the linear):
      h_E term with coefficient mask_bw+mask_fw = mask_1d, a static h_S term,
      a static mask_fw encoder-node term, and a per-layer mask_bw node term —
    so no [B,L,K,3H] concat is ever materialized.
    """
    from .modules import _message_tail, _split_w1, dropout, layer_norm, pff_apply

    if cfg.compute_dtype == "bfloat16":
        dec_params = jax.tree.map(
            lambda x: jnp.asarray(x).astype(jnp.bfloat16)
            if jnp.asarray(x).dtype == jnp.float32 else x, params["decoder"])
        params = {**params, "decoder": dec_params}
        h_V = h_V.astype(jnp.bfloat16)
        h_E = h_E.astype(jnp.bfloat16)
        h_S = h_S.astype(jnp.bfloat16)
        mask = mask.astype(jnp.bfloat16)
        mask_bw = mask_bw.astype(jnp.bfloat16)
        mask_fw = mask_fw.astype(jnp.bfloat16)

    H = h_V.shape[-1]
    h_V_enc = h_V
    mask_1d = mask[:, :, None, None]

    def static_terms(layer_params):
        (wa, wb, ws, wv), b1 = _split_w1(layer_params, H)
        e_term = mask_1d * jnp.dot(h_E, wb)
        s_term = mask_bw * gather_nodes(jnp.dot(h_S, ws), E_idx)
        venc_term = mask_fw * gather_nodes(jnp.dot(h_V_enc, wv), E_idx)
        return wa, wv, b1, e_term + s_term + venc_term + b1

    def edge_context(layer_params, h_V_cur):
        """All three neighbor terms through ONE concatenated gather (the
        three separate [B,L,K,H] gathers each pay the relay's per-op cost):
        ctx = mask_bw*(gather(h_S@ws) + gather(h_V@wv)) + mask_fw*gather(h_Venc@wv).
        Returns (wa, e_term, ctx)."""
        (wa, wb, ws, wv), b1 = _split_w1(layer_params, H)
        nodes3 = jnp.concatenate(
            [jnp.dot(h_S, ws), jnp.dot(h_V_cur, wv), jnp.dot(h_V_enc, wv)],
            axis=-1)
        g = gather_nodes(nodes3, E_idx)
        ctx = (mask_bw * (g[..., :H] + g[..., H:2 * H])
               + mask_fw * g[..., 2 * H:])
        e_term = mask_1d * jnp.dot(h_E, wb)
        return wa, e_term, ctx

    def run_layer(layer_params, h_V, lkey):
        wa, wv, _, static = static_terms(layer_params)
        x = (jnp.dot(h_V, wa)[:, :, None, :]
             + mask_bw * gather_nodes(jnp.dot(h_V, wv), E_idx) + static)
        h_message = _message_tail(layer_params, x)
        dh = jnp.sum(h_message, axis=-2) / 30.0
        if not deterministic and lkey is not None:
            k1, k2 = jax.random.split(lkey)
        else:
            k1 = k2 = None
        h_V = layer_norm(layer_params["norm1"],
                         h_V + dropout(dh, cfg.dropout, k1, deterministic))
        dh = pff_apply(layer_params["dense"], h_V)
        h_V = layer_norm(layer_params["norm2"],
                         h_V + dropout(dh, cfg.dropout, k2, deterministic))
        return mask[..., None] * h_V

    if _use_fused_layers(cfg):
        from jax.ad_checkpoint import checkpoint_name
        from ..ops import interpret_mode
        from ..ops.message_kernels import (message_agg_batched,
                                           message_dec_table_batched,
                                           table_gather_ok)
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        interp = interpret_mode()
        use_table = table_gather_ok(*mask.shape)

        if deterministic and not use_table:
            from ..ops.fused_layers import dec_layer_fused
            for layer_params in params["decoder"]:
                _, e_term, ctx = edge_context(layer_params, h_V)
                # the kernel adds b1 itself; e_term rides the G slot
                h_V = dec_layer_fused(layer_params, h_V, ctx, e_term, mask,
                                      compute_dtype=cdt, interpret=interp)
            return h_V

        B, L = mask.shape
        if use_table:
            # Flat-edge decoder: h_E and the per-edge masks stay [N*K, *]
            # across the stack (see _enc_layer_train_fused notes).
            from ..ops.message_kernels import (_flat_eidx,
                                               message_dec_table_flat)
            N, K = B * L, E_idx.shape[2]
            h_E2 = h_E.reshape(N * K, H)
            eidx2 = _flat_eidx(E_idx)
            m1d2 = jnp.broadcast_to(mask[:, :, None],
                                    (B, L, K)).reshape(N * K, 1)
            mbw2 = mask_bw.reshape(N * K, 1)

        def run_layer_kernel(layer_params, h_V, lkey):
            if use_table:
                (_, _, ws, wv), _ = _split_w1(layer_params, H)
                # 2H table [A | B]: ctx = mask_bw*selA + mask_1d*selB is
                # exactly the 3-term context because mask_fw = mask_1d -
                # mask_bw (autoregressive_edge_masks).
                venc = jnp.dot(h_V_enc, wv)
                nodes2 = jnp.concatenate(
                    [jnp.dot(h_S, ws) + jnp.dot(h_V, wv) - venc, venc],
                    axis=-1)
                dh = message_dec_table_flat(
                    layer_params, h_V.reshape(N, H), h_E2,
                    nodes2.reshape(N, 2 * H), eidx2, m1d2, mbw2,
                    K=K, L=L, compute_dtype=cdt,
                    interpret=interp).reshape(B, L, H)
            else:
                _, e_term, ctx = edge_context(layer_params, h_V)
                ones_att = jnp.ones(ctx.shape[:3], h_V.dtype)
                dh = message_agg_batched(layer_params, h_V, ctx, e_term,
                                         ones_att, contract_e=False,
                                         compute_dtype=cdt, interpret=interp)
            dh = checkpoint_name(dh, "msg_kernel_out")
            if lkey is not None:
                k1, k2 = jax.random.split(lkey)
            else:
                k1 = k2 = None
            h_V = layer_norm(layer_params["norm1"],
                             h_V + dropout(dh, cfg.dropout, k1, deterministic))
            dh = pff_apply(layer_params["dense"], h_V)
            h_V = layer_norm(layer_params["norm2"],
                             h_V + dropout(dh, cfg.dropout, k2, deterministic))
            return mask[..., None] * h_V

        if deterministic:
            for layer_params in params["decoder"]:
                h_V = run_layer_kernel(layer_params, h_V, None)
            return h_V

        if cfg.remat == "none":
            for i, layer_params in enumerate(params["decoder"]):
                h_V = run_layer_kernel(layer_params, h_V, layer_keys[i])
            return h_V
        policy = jax.checkpoint_policies.save_only_these_names("msg_kernel_out")
        for i, layer_params in enumerate(params["decoder"]):
            h_V = jax.checkpoint(run_layer_kernel, policy=policy)(
                layer_params, h_V, layer_keys[i])
        return h_V

    for i, layer_params in enumerate(params["decoder"]):
        if not deterministic and cfg.remat != "none":
            h_V = jax.checkpoint(run_layer)(layer_params, h_V, layer_keys[i])
        else:
            h_V = run_layer(layer_params, h_V, layer_keys[i])
    return h_V


def forward(params, cfg: ModelConfig, batch, key: Optional[jax.Array] = None,
            deterministic: bool = True):
    """Training forward pass -> (log_probs, probs), both [B,L,num_letters].

    Mirrors reference ProteinMPNN.forward (na_model_utils.py:589-646). The
    random decode order is drawn from `key` unless batch["decoding_order"]
    is provided (useful for parity tests and deterministic replay).
    """
    if key is not None:
        key_enc, key_order, key_dec = jax.random.split(key, 3)
        dec_keys = jax.random.split(key_dec, cfg.num_decoder_layers)
    else:
        key_enc, key_order, dec_keys = None, None, [None] * cfg.num_decoder_layers

    mask = batch["mask"].astype(jnp.float32)
    h_V, h_E, E_idx = encode(params, cfg, batch, key_enc, deterministic)
    h_S = embed_tokens(params, batch["S"])

    chain_M = mask
    if cfg.decode_protein_first:
        chain_M = chain_M * (1.0 - batch["protein_mask"].astype(jnp.float32))

    if "decoding_order" in batch:
        decoding_order = batch["decoding_order"]
    else:
        if key_order is None:  # deterministic replay default
            key_order = jax.random.PRNGKey(0)
        decoding_order = sample_decoding_order(key_order, chain_M)

    mask_bw, mask_fw = autoregressive_edge_masks(decoding_order, E_idx, mask)
    h_V = _decoder_parallel(params, cfg, h_V, h_E, E_idx, mask, h_S,
                            mask_bw, mask_fw, dec_keys, deterministic)

    if h_V.dtype == jnp.bfloat16:
        h_V = h_V.astype(jnp.float32)
    logits = linear(params["W_out"], h_V)
    return jax.nn.log_softmax(logits, axis=-1), jax.nn.softmax(logits, axis=-1)


def score(params, cfg: ModelConfig, batch, decoding_order=None,
          key: Optional[jax.Array] = None):
    """Teacher-forced scoring of batch["S"] under a (random or given) decode
    order (reference score, inference/model_utils.py:366-424). Eval mode only.
    Returns {"S", "log_probs", "decoding_order"}.
    """
    mask = batch["mask"].astype(jnp.float32)
    chain_mask = mask * batch["chain_mask"].astype(jnp.float32)
    h_V, h_E, E_idx = encode(params, cfg, batch)
    if decoding_order is None:
        decoding_order = sample_decoding_order(key, chain_mask)
    mask_bw, mask_fw = autoregressive_edge_masks(decoding_order, E_idx, mask)
    h_S = embed_tokens(params, batch["S"])
    h_V = _decoder_parallel(params, cfg, h_V, h_E, E_idx, mask, h_S, mask_bw,
                            mask_fw, [None] * cfg.num_decoder_layers, True)
    logits = linear(params["W_out"], h_V)
    return {
        "S": batch["S"],
        "log_probs": jax.nn.log_softmax(logits, axis=-1),
        "decoding_order": decoding_order,
    }


def unconditional_probs(params, cfg: ModelConfig, batch):
    """Decoder with zero sequence context everywhere
    (reference unconditional_probs, inference/model_utils.py:329-364)."""
    mask = batch["mask"].astype(jnp.float32)
    h_V, h_E, E_idx = encode(params, cfg, batch)
    B, L, K = E_idx.shape
    mask_fw = mask[:, :, None, None] * jnp.ones((B, L, K, 1), jnp.float32)
    h_EX_encoder = cat_neighbors_nodes(jnp.zeros_like(h_V), h_E, E_idx)
    h_EXV_encoder = cat_neighbors_nodes(h_V, h_EX_encoder, E_idx)
    h_EXV_encoder_fw = mask_fw * h_EXV_encoder
    for layer_params in params["decoder"]:
        h_V = dec_layer_apply(layer_params, h_V, h_EXV_encoder_fw, mask)
    logits = linear(params["W_out"], h_V)
    return {"log_probs": jax.nn.log_softmax(logits, axis=-1)}


# ---------------------------------------------------------------------------
# Autoregressive sampling (lax.scan over decode steps)
# ---------------------------------------------------------------------------

def _pair_bias_step(pair_bias_ctx, t, S):
    """O(1)-per-step neighbor pair bias.

    The reference materializes a [1,L,33,L,33] tensor whose only nonzeros sit
    on the sequence-adjacent diagonals (inference/data_utils.py:7-16) and
    reduces it per step (inference/model_utils.py:169-172). Here we evaluate
    the same sum directly from the diagonal structure:
      bias_t[a] = u[t]   * P[a, S[t+1]]      (next residue, same chain)
                + l[t-1] * P[S[t-1], a]      (previous residue, same chain)
    where P = pair_bias_AA and u/l are the adjacency indicators.
    """
    P, u_diag = pair_bias_ctx["pair_bias_AA"], pair_bias_ctx["u_diag"]
    B, L = S.shape
    nl = P.shape[0]
    # u_diag is [L-1] (one structure shared across the decode batch) or
    # [B,L-1] (per-row adjacency, the sample_multi case).
    if u_diag.ndim == 1:
        u_diag = jnp.broadcast_to(u_diag, (B,) + u_diag.shape)
    b_idx = jnp.arange(B)
    t_next = jnp.minimum(t + 1, L - 1)
    t_prev = jnp.maximum(t - 1, 0)
    S_next = jnp.take_along_axis(S, t_next[:, None], axis=1)[:, 0]
    S_prev = jnp.take_along_axis(S, t_prev[:, None], axis=1)[:, 0]
    u_t = u_diag[b_idx, jnp.minimum(t, L - 2)] * (t < L - 1)
    l_t = u_diag[b_idx, jnp.maximum(t - 1, 0)] * (t > 0)
    fwd = u_t[:, None] * P[:, S_next].T.reshape(B, nl)
    bwd = l_t[:, None] * P[S_prev, :].reshape(B, nl)
    return fwd + bwd


def sample(params, cfg: ModelConfig, batch, key, num_samples: int = 1,
           temperature=0.1, bias=None, pair_bias_ctx=None):
    """Autoregressive sampling -> {"S", "sampling_probs", "log_probs",
    "decoding_order"}; all [num_samples,L,...]. Mirrors reference sample
    (inference/model_utils.py:101-218) as a single `lax.scan`: the structure
    is encoded once (batch dim 1) and the encoder outputs are tiled to the
    decode batch, each replica drawing its own decode order.

    `bias` is [L,num_letters] (or [num_samples,L,num_letters]); fixed
    positions (chain_mask==0) keep batch["S"].
    """
    L = batch["S"].shape[-1]
    B = num_samples
    nl = cfg.num_letters

    key_order, key_steps = jax.random.split(key)

    h_V0, h_E, E_idx = encode(params, cfg, batch)
    # Tile single-structure encode outputs to the decode batch.
    h_V0 = jnp.broadcast_to(h_V0[0], (B,) + h_V0.shape[1:])
    h_E = jnp.broadcast_to(h_E[0], (B,) + h_E.shape[1:])
    E_idx = jnp.broadcast_to(E_idx[0], (B,) + E_idx.shape[1:])
    mask = jnp.broadcast_to(batch["mask"][0], (B, L)).astype(jnp.float32)
    chain_mask = mask * jnp.broadcast_to(
        batch["chain_mask"][0], (B, L)).astype(jnp.float32)
    S_true = jnp.broadcast_to(batch["S"][0], (B, L))

    if "decoding_order" in batch:
        decoding_order = jnp.broadcast_to(batch["decoding_order"], (B, L))
    else:
        decoding_order = sample_decoding_order(key_order, chain_mask)

    if bias is not None:
        bias = jnp.broadcast_to(bias, (B, L, nl))
    return _sample_scan(params, cfg, h_V0, h_E, E_idx, mask, chain_mask,
                        S_true, decoding_order, key_steps, temperature, bias,
                        pair_bias_ctx)


def sample_multi(params, cfg: ModelConfig, batch, key,
                 samples_per_structure: int = 1, temperature=0.1, bias=None,
                 pair_bias_ctx=None):
    """Batched multi-structure sampling: `batch` holds N different (padded)
    structures; every structure is encoded in one batched pass, each row is
    replicated `samples_per_structure` times, and all N*S designs decode in
    one lax.scan. TPU-side throughput feature — the reference designs one
    PDB per process (inference/run.py) and scales by Slurm array
    (evaluation_cmds.txt:104-108); here one chip amortizes the whole batch.

    `bias` is [N,L,num_letters] per structure (or [L,num_letters] shared).
    `pair_bias_ctx["u_diag"]` is the per-structure adjacency diagonal
    [N,L-1] (or [L-1] shared); pair_bias_AA is shared. Returns the same
    dict as `sample` with leading dim N*S, ordered structure-major
    (rows i*S..(i+1)*S-1 belong to structure i).
    """
    N, L = batch["S"].shape
    S_rep = samples_per_structure
    nl = cfg.num_letters
    key_order, key_steps = jax.random.split(key)

    h_V0, h_E, E_idx = encode(params, cfg, batch)

    def rep(x):
        return jnp.repeat(x, S_rep, axis=0)

    h_V0, h_E, E_idx = rep(h_V0), rep(h_E), rep(E_idx)
    mask = rep(batch["mask"].astype(jnp.float32))
    chain_mask = mask * rep(batch["chain_mask"].astype(jnp.float32))
    S_true = rep(batch["S"])
    if bias is not None:
        bias = jnp.broadcast_to(bias, (N, L, nl))
        bias = rep(bias)
    if pair_bias_ctx is not None:
        u = jnp.broadcast_to(pair_bias_ctx["u_diag"], (N, L - 1))
        pair_bias_ctx = {**pair_bias_ctx, "u_diag": rep(u)}
    decoding_order = sample_decoding_order(key_order, chain_mask)
    return _sample_scan(params, cfg, h_V0, h_E, E_idx, mask, chain_mask,
                        S_true, decoding_order, key_steps, temperature, bias,
                        pair_bias_ctx)


def _sample_scan(params, cfg: ModelConfig, h_V0, h_E, E_idx, mask,
                 chain_mask, S_true, decoding_order, key_steps, temperature,
                 bias, pair_bias_ctx):
    """Shared autoregressive decode scan over a fully-prepared decode batch
    (every operand already [B,...]).

    Latency-optimized formulation of the reference per-position loop
    (inference/model_utils.py:164-216). Three structural moves cut the
    per-step op chain from ~10 dynamic gathers + 5 full-width scatters to
    2 gathers + 2 row scatters:

    * Every per-step read of STATIC data (edge features, causal masks,
      encoder-node edge terms, bias, chain masks) is pre-permuted into
      decode order once and fed to the scan as sliced `xs` — the scan body
      never random-accesses static arrays.
    * The per-layer concat(h_Vi, h_E, h_Sj, h_Vj) @ W1 is split per block
      (as in the parallel decoder): the h_E and encoder-node blocks are
      static per layer; layer 0's decoder-node block gathers h_V_stack[0]
      = the encoder output, also static. Only the h_S block and layers>=1
      node blocks remain dynamic — one neighbor gather each per step (the
      mid-stack levels are feature-concatenated so ONE gather serves all).
    * The final stack level is never gathered by later steps (a node's
      self-edge is always causally masked), so it is not stored; per-step
      probability rows are emitted as scan outputs and un-permuted once at
      the end instead of scattered into [B,L,nl] carries every step.
    """
    B, L = mask.shape
    K = E_idx.shape[-1]
    nl = cfg.num_letters
    mask_bw, mask_fw = autoregressive_edge_masks(decoding_order, E_idx, mask)

    fdtype = h_V0.dtype
    if bias is None:
        bias = jnp.zeros((B, L, nl), fdtype)
    else:
        bias = jnp.broadcast_to(bias, (B, L, nl)).astype(fdtype)

    n_dec = cfg.num_decoder_layers
    H = cfg.hidden_dim
    omit = jnp.zeros((nl,), fdtype).at[jnp.asarray(_OMIT_ALWAYS)].set(1.0)
    mask_bw = mask_bw.astype(fdtype)
    mask_fw = mask_fw.astype(fdtype)
    mask_1d = mask.astype(fdtype)[:, :, None, None]

    # Per-layer static edge terms: e + (causally mixed) encoder-node + b1.
    # Layer 0 reads h_V_stack[0] = h_V0 for its decoder-node block, so
    # mask_bw*venc + mask_fw*venc = mask_1d*venc absorbs it statically.
    from .modules import _message_tail, _split_w1, layer_norm, pff_apply
    w_splits = [_split_w1(p, H) for p in params["decoder"]]
    statics = []
    for l, ((wa, wb, ws, wv), b1) in enumerate(w_splits):
        venc = gather_nodes(jnp.dot(h_V0, wv.astype(fdtype)), E_idx)
        coeff = mask_1d if l == 0 else mask_fw
        statics.append(mask_1d * jnp.dot(h_E, wb.astype(fdtype))
                       + coeff * venc + b1.astype(fdtype))
    statics = jnp.stack(statics, axis=2)  # [B,L,n_dec,K,H]

    rank = decode_rank(decoding_order)  # [B,L]: step at which position decodes

    def perm(x):
        """Reorder positions ([B,L,...]) into decode order, time-major
        [L,B,...], as one flat row-gather (see modules.take_rows)."""
        from .modules import take_rows
        return jnp.moveaxis(take_rows(x, decoding_order), 1, 0)

    xs = {
        "t": decoding_order.T,                      # [L,B]
        "E_idx": perm(E_idx),                       # [L,B,K]
        "mask_bw": perm(mask_bw[..., 0]),           # [L,B,K]
        "static": perm(statics),                    # [L,B,n_dec,K,H]
        "h_V0": perm(h_V0),                         # [L,B,H]
        "chain_mask": perm(chain_mask),             # [L,B]
        "mask": perm(mask),                         # [L,B]
        "bias": perm(bias),                         # [L,B,nl]
        "S_true": perm(S_true),                     # [L,B]
        "key": jax.random.split(key_steps, L),
    }

    init_carry = {
        "h_S": jnp.zeros((B, L, H), fdtype),
    }
    if n_dec > 1:
        init_carry["h_V_mid"] = jnp.zeros((B, L, (n_dec - 1) * H), fdtype)
    if pair_bias_ctx is not None:
        init_carry["S"] = jnp.full((B, L), nl - 1, jnp.int32)
    b_idx = jnp.arange(B)

    def step(carry, x):
        t = x["t"]                                   # [B]
        bw = x["mask_bw"][..., None]                 # [B,K,1]
        # Dynamic neighbor context: decoded-sequence embeddings and the
        # mid-stack node features, one gather each.
        from .modules import take_rows
        s_nb = bw * take_rows(carry["h_S"], x["E_idx"])             # [B,K,H]
        if n_dec > 1:
            mid_nb = bw * take_rows(carry["h_V_mid"], x["E_idx"])

        h_V_t = x["h_V0"]                            # [B,H]
        mask_t = x["mask"].astype(fdtype)
        mid_out = []
        for l, layer_params in enumerate(params["decoder"]):
            (wa, _, ws, wv), _ = w_splits[l]
            xin = (jnp.dot(h_V_t, wa.astype(fdtype))[:, None, :]
                   + jnp.dot(s_nb, ws.astype(fdtype)) + x["static"][:, l])
            if l >= 1:
                xin = xin + jnp.dot(mid_nb[..., (l - 1) * H:l * H],
                                    wv.astype(fdtype))
            h_message = _message_tail(layer_params, xin)  # [B,K,H]
            dh = jnp.sum(h_message, axis=1) / 30.0
            h_V_t = layer_norm(layer_params["norm1"], h_V_t + dh)
            dh = pff_apply(layer_params["dense"], h_V_t)
            h_V_t = layer_norm(layer_params["norm2"], h_V_t + dh)
            h_V_t = (mask_t[:, None] * h_V_t).astype(fdtype)
            if l + 1 <= n_dec - 1:
                mid_out.append(h_V_t)

        logits = linear(params["W_out"], h_V_t)      # [B,nl]
        log_probs = jax.nn.log_softmax(logits, axis=-1)

        total_bias = x["bias"]
        if pair_bias_ctx is not None:
            total_bias = total_bias + _pair_bias_step(pair_bias_ctx, t, carry["S"])
        probs = jax.nn.softmax((logits + total_bias) / temperature, axis=-1)
        probs = probs * (1.0 - omit)
        probs_sample = probs / jnp.sum(probs, axis=-1, keepdims=True)

        S_t = jax.random.categorical(x["key"], jnp.log(probs_sample + 1e-30),
                                     axis=-1)
        cm_t = x["chain_mask"]
        S_t = jnp.where(cm_t > 0, S_t, x["S_true"]).astype(jnp.int32)

        carry = dict(carry)
        carry["h_S"] = carry["h_S"].at[b_idx, t].set(
            embed_tokens(params, S_t).astype(fdtype))
        if n_dec > 1:
            carry["h_V_mid"] = carry["h_V_mid"].at[b_idx, t].set(
                jnp.concatenate(mid_out, axis=-1))
        if pair_bias_ctx is not None:
            carry["S"] = carry["S"].at[b_idx, t].set(S_t)
        ys = (S_t,
              (cm_t[:, None] * probs_sample).astype(fdtype),
              (cm_t[:, None] * log_probs).astype(fdtype))
        return carry, ys

    _, (S_seq, probs_seq, log_probs_seq) = jax.lax.scan(step, init_carry, xs)

    # Un-permute the per-step outputs back to position order: position i of
    # row b was decoded at step rank[b,i].
    def unperm(y):  # [L,B,...] -> [B,L,...]
        from .modules import take_rows
        return take_rows(jnp.moveaxis(y, 0, 1), rank)

    # The reference never writes the PAD column of sampling_probs
    # (scatter over num_letters-1; inference/model_utils.py:211) — it is zero
    # there too since PAD is omitted, so semantics agree.
    return {
        "S": unperm(S_seq),
        "sampling_probs": unperm(probs_seq),
        "log_probs": unperm(log_probs_seq),
        "decoding_order": decoding_order,
    }


# ---------------------------------------------------------------------------
# Tied-position (symmetry) sampling
# ---------------------------------------------------------------------------

def build_decode_groups(decoding_order, symmetry_residues, symmetry_weights, L):
    """Host-side: group the decode order by symmetry-tied position sets.

    Mirrors reference inference/model_utils.py:226-235: walk the base order;
    the first time a member of a tied set appears, its whole set decodes as
    one group. Returns (groups [G,M] int32 padded with -1, weights [G,M]
    float32, flat_order [L]).
    """
    import numpy as np

    order = [int(t) for t in np.asarray(decoding_order).reshape(-1)]
    sym_sets = [list(s) for s in symmetry_residues if len(s) > 0]
    sym_w = [list(w) for w in symmetry_weights if len(w) > 0]
    new_groups = []
    seen = set()
    for t in order:
        if t in seen:
            continue
        hit = None
        for i, s in enumerate(sym_sets):
            if t in s:
                hit = i
                break
        if hit is not None:
            g = sym_sets[hit]
            w = sym_w[hit] if hit < len(sym_w) else [1.0] * len(g)
        else:
            g, w = [t], [1.0]
        for x in g:
            seen.add(x)
        new_groups.append((g, w))
    M = max(len(g) for g, _ in new_groups)
    G = len(new_groups)
    groups = np.full((G, M), -1, np.int32)
    weights = np.zeros((G, M), np.float32)
    for i, (g, w) in enumerate(new_groups):
        groups[i, :len(g)] = g
        weights[i, :len(g)] = w
    flat = np.concatenate([np.asarray(g, np.int32) for g, _ in new_groups])
    assert flat.shape[0] == L, "decode groups must cover every position exactly once"
    return groups, weights, flat


def sample_tied(params, cfg: ModelConfig, batch, key, groups, group_weights,
                flat_order, num_samples: int = 1, temperature=0.1, bias=None,
                pair_bias_ctx=None):
    """Symmetry-tied autoregressive sampling (reference
    inference/model_utils.py:219-327): tied positions decode together, their
    weighted logits are summed, one token is drawn for the whole group.

    groups: [G,M] int32 (pad -1); group_weights: [G,M] float; flat_order: [L]
    (the shared decode order). All decode replicas share the order, matching
    the reference.
    """
    L = batch["S"].shape[-1]
    B = num_samples
    nl = cfg.num_letters
    G, M = groups.shape

    h_V0, h_E, E_idx = encode(params, cfg, batch)
    h_V0 = jnp.broadcast_to(h_V0[0], (B,) + h_V0.shape[1:])
    h_E = jnp.broadcast_to(h_E[0], (B,) + h_E.shape[1:])
    E_idx = jnp.broadcast_to(E_idx[0], (B,) + E_idx.shape[1:])
    mask = jnp.broadcast_to(batch["mask"][0], (B, L)).astype(jnp.float32)
    chain_mask = mask * jnp.broadcast_to(
        batch["chain_mask"][0], (B, L)).astype(jnp.float32)
    S_true = jnp.broadcast_to(batch["S"][0], (B, L))

    decoding_order = jnp.broadcast_to(jnp.asarray(flat_order, jnp.int32), (B, L))
    mask_bw, mask_fw = autoregressive_edge_masks(decoding_order, E_idx, mask)

    h_EX_encoder = cat_neighbors_nodes(jnp.zeros_like(h_V0), h_E, E_idx)
    h_EXV_encoder = cat_neighbors_nodes(h_V0, h_EX_encoder, E_idx)
    h_EXV_encoder_fw = mask_fw * h_EXV_encoder

    fdtype = h_V0.dtype
    if bias is None:
        bias = jnp.zeros((B, L, nl), fdtype)
    else:
        bias = jnp.broadcast_to(bias, (B, L, nl)).astype(fdtype)

    n_dec = cfg.num_decoder_layers
    H = cfg.hidden_dim
    omit = jnp.zeros((nl,), fdtype).at[jnp.asarray(_OMIT_ALWAYS)].set(1.0)
    groups_j = jnp.asarray(groups, jnp.int32)
    weights_j = jnp.asarray(group_weights, fdtype)
    b_idx = jnp.arange(B)

    init_carry = {
        "h_V_stack": jnp.concatenate(
            [h_V0[None], jnp.zeros((n_dec, B, L, H), fdtype)], axis=0),
        "h_S": jnp.zeros((B, L, H), fdtype),
        "S": jnp.full((B, L), nl - 1, jnp.int32),
        "all_probs": jnp.zeros((B, L, nl), fdtype),
        "all_log_probs": jnp.zeros((B, L, nl), fdtype),
    }
    group_keys = jax.random.split(key, G)

    def decode_position(carry, t, valid):
        """Run the decoder stack at (broadcast) position t -> logits [B,nl].
        Stack/h writes are gated on `valid` (pad slots are no-ops)."""
        t_b = jnp.broadcast_to(t, (B,))
        mask_t = mask[b_idx, t_b]
        E_idx_t = E_idx[b_idx, t_b][:, None, :]
        h_E_t = h_E[b_idx, t_b][:, None]
        h_ES_t = cat_neighbors_nodes(carry["h_S"], h_E_t, E_idx_t)
        h_EXV_t = h_EXV_encoder_fw[b_idx, t_b][:, None]
        mask_bw_t = mask_bw[b_idx, t_b][:, None]
        h_V_stack = carry["h_V_stack"]
        for l, layer_params in enumerate(params["decoder"]):
            h_ESV_dec_t = cat_neighbors_nodes(h_V_stack[l], h_ES_t, E_idx_t)
            h_V_t = h_V_stack[l][b_idx, t_b][:, None]
            h_ESV_t = mask_bw_t * h_ESV_dec_t + h_EXV_t
            out = dec_layer_apply(layer_params, h_V_t, h_ESV_t, mask_V=mask_t[:, None])
            new_val = jnp.where(valid, out[:, 0].astype(h_V_stack.dtype),
                                h_V_stack[l + 1][b_idx, t_b])
            h_V_stack = h_V_stack.at[l + 1, b_idx, t_b].set(new_val)
        logits = linear(params["W_out"], h_V_stack[n_dec, b_idx, t_b])
        return {**carry, "h_V_stack": h_V_stack}, logits

    def group_step(carry, inp):
        g_idx, gkey = inp
        ts = groups_j[g_idx]          # [M]
        ws = weights_j[g_idx]         # [M]
        total_logits = jnp.zeros((B, nl), fdtype)
        bias_t = jnp.zeros((B, nl), fdtype)
        pair_bias_t = jnp.zeros((B, nl), fdtype)
        for m in range(M):
            t_raw = ts[m]
            valid = t_raw >= 0
            t = jnp.maximum(t_raw, 0)
            carry, logits = decode_position(carry, t, valid)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            t_b = jnp.broadcast_to(t, (B,))
            cm_t = chain_mask[b_idx, t_b]
            carry = {**carry, "all_log_probs": jnp.where(
                valid,
                carry["all_log_probs"].at[b_idx, t_b].set(
                    (cm_t[:, None] * log_probs).astype(fdtype)),
                carry["all_log_probs"])}
            total_logits = total_logits + jnp.where(valid, ws[m] * logits, 0.0)
            # Reference keeps the *last* t's bias for the group softmax.
            bias_t = jnp.where(valid, bias[b_idx, t_b], bias_t)
            if pair_bias_ctx is not None:
                pair_bias_t = jnp.where(
                    valid, _pair_bias_step(pair_bias_ctx, t_b, carry["S"]), pair_bias_t)

        probs = jax.nn.softmax((total_logits + bias_t + pair_bias_t) / temperature, axis=-1)
        probs = probs * (1.0 - omit)
        probs_sample = probs / jnp.sum(probs, axis=-1, keepdims=True)
        S_t = jax.random.categorical(gkey, jnp.log(probs_sample + 1e-30), axis=-1)
        S_t = S_t.astype(jnp.int32)

        h_S, S, all_probs = carry["h_S"], carry["S"], carry["all_probs"]
        for m in range(M):
            t_raw = ts[m]
            valid = t_raw >= 0
            t = jnp.maximum(t_raw, 0)
            t_b = jnp.broadcast_to(t, (B,))
            cm_t = chain_mask[b_idx, t_b]
            all_probs = jnp.where(
                valid, all_probs.at[b_idx, t_b].set(
                    (cm_t[:, None] * probs_sample).astype(fdtype)),
                all_probs)
            S_true_t = S_true[b_idx, t_b]
            # NOTE: S_t carries across tied positions, matching the reference's
            # in-loop reassignment (inference/model_utils.py:318-324).
            S_t = jnp.where(valid,
                            jnp.where(cm_t > 0, S_t, S_true_t).astype(jnp.int32), S_t)
            h_S = jnp.where(valid, h_S.at[b_idx, t_b].set(
                embed_tokens(params, S_t).astype(fdtype)), h_S)
            S = jnp.where(valid, S.at[b_idx, t_b].set(S_t), S)
        carry = {**carry, "h_S": h_S, "S": S, "all_probs": all_probs}
        return carry, None

    carry, _ = jax.lax.scan(group_step, init_carry, (jnp.arange(G), group_keys))
    return {
        "S": carry["S"],
        "sampling_probs": carry["all_probs"],
        "log_probs": carry["all_log_probs"],
        "decoding_order": decoding_order,
    }
