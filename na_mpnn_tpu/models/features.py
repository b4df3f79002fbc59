"""Geometric featurization: virtual atoms, k-NN graph, RBF edge features.

JAX re-design of the reference featurizer (reference na_model_utils.py:349-517
and the duplicate inference/model_utils.py:426-593). All pairwise work is done
per-edge (O(L*K)) rather than materializing [L,L] tensors where possible; the
k-NN selection itself uses a masked dense distance + top_k, which XLA tiles
onto the TPU efficiently for the L<=6k regime the data pipeline guarantees.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import constants
from .config import ModelConfig
from .modules import gather_nodes, init_layer_norm, init_linear, layer_norm, linear

RBF_D_MIN = 2.0
RBF_D_MAX = 22.0


def get_virtual_atom(a1, a2, a3, w_a, w_b, w_c):
    """Place a virtual atom from three anchors (reference get_Cb,
    na_model_utils.py:445-450): Cb from (N,CA,C), pseudo base-N from
    (O4',C1',C2')."""
    b = a2 - a1
    c = a3 - a2
    a = jnp.cross(b, c)
    return w_a * a + w_b * b + w_c * c + a2


def knn_graph(X_ref, mask, k, eps=1e-6):
    """Masked k-nearest-neighbor graph.

    X_ref: [B,L,3] reference coords (Ca + C1', disjoint support), mask: [B,L].
    Returns (D_neighbors [B,L,K], E_idx [B,L,K]) — the K smallest masked
    distances per node, matching reference ProteinFeatures._dist
    (na_model_utils.py:413-421): invalid pairs are pushed to the row max so
    they sort last.
    """
    mask = mask.astype(X_ref.dtype)
    mask_2d = mask[:, None, :] * mask[:, :, None]
    dX = X_ref[:, :, None, :] - X_ref[:, None, :, :]
    D = mask_2d * jnp.sqrt(jnp.sum(dX * dX, axis=-1) + eps)
    D_max = jnp.max(D, axis=-1, keepdims=True)
    D_adjust = D + (1.0 - mask_2d) * D_max
    k = min(k, X_ref.shape[1])
    neg_D, E_idx = jax.lax.top_k(-D_adjust, k)
    return -neg_D, E_idx


def rbf_embed(D, num_rbf):
    """Radial basis expansion over [2, 22] Å with num_rbf bins
    (reference _rbf, na_model_utils.py:423-431)."""
    mu = jnp.linspace(RBF_D_MIN, RBF_D_MAX, num_rbf, dtype=D.dtype)
    sigma = (RBF_D_MAX - RBF_D_MIN) / num_rbf
    z = (D[..., None] - mu) / sigma
    return jnp.exp(-z * z)


def all_pair_rbf(X_aug, E_idx, X_m_aug, num_rbf):
    """All-pair-atom RBF features per edge.

    X_aug: [B,L,A,3] (A = 18 with both virtual atoms), X_m_aug: [B,L,A].
    Returns [B,L,K,A*A*num_rbf], masked by atom validity on both endpoints
    (reference _get_all_rbf, na_model_utils.py:433-443).
    """
    B, L, A, _ = X_aug.shape
    X_flat = X_aug.reshape(B, L, A * 3)
    X_g = gather_nodes(X_flat, E_idx).reshape(B, L, E_idx.shape[2], A, 3)
    d = X_aug[:, :, None, :, None, :] - X_g[:, :, :, None, :, :]
    D = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-6)           # [B,L,K,A,A]
    RBF = rbf_embed(D, num_rbf)                             # [B,L,K,A,A,R]
    X_m_g = gather_nodes(X_m_aug, E_idx)                    # [B,L,K,A]
    RBF = RBF * X_m_aug[:, :, None, :, None, None] * X_m_g[:, :, :, None, :, None]
    return RBF.reshape(B, L, E_idx.shape[2], A * A * num_rbf)


def positional_embed(p, offset, E_chains, max_relative_feature):
    """Relative-position embedding clipped at ±max_relative_feature with a
    separate cross-chain bucket (reference PositionalEncodings,
    na_model_utils.py:336-347)."""
    d = jnp.clip(offset + max_relative_feature, 0, 2 * max_relative_feature)
    d = d * E_chains + (1 - E_chains) * (2 * max_relative_feature + 1)
    # Row-gather of the embedding table: exactly linear(p, one_hot(d)) — the
    # one-hot matmul would pad a 66-wide contraction onto the MXU and
    # materialize a [B,L,K,66] intermediate for nothing.
    out = p["w"][d]
    return out + p["b"] if "b" in p else out


def augment_coordinates(X, X_m, batch, cfg: ModelConfig, key):
    """Per-polymer-type Gaussian coordinate noise (training only; reference
    na_model_utils.py:463-470)."""
    augment_eps = (
        batch["protein_mask"] * cfg.protein_augment_eps
        + batch["dna_mask"] * cfg.dna_augment_eps
        + batch["rna_mask"] * cfg.rna_augment_eps
    ).astype(X.dtype)
    from .modules import _bulk_mask_key
    noise = jax.random.normal(_bulk_mask_key(key), X.shape, X.dtype)
    return X + X_m[:, :, :, None].astype(X.dtype) * augment_eps[:, :, None, None] * noise


def build_augmented_atoms(X, X_m, batch, cfg: ModelConfig):
    """Append virtual Cb and (optionally) virtual base-N to the atom frame.

    Returns (X_aug [B,L,A,3], X_m_aug [B,L,A], X_ref [B,L,3]) where X_ref is
    the per-residue reference coordinate (Ca for protein + C1' for NA — the
    two are disjoint, so the sum is the residue center; reference
    na_model_utils.py:472-497).
    """
    ad = cfg.atom_dict
    N = X[:, :, ad["N"], :]
    Ca = X[:, :, ad["CA"], :]
    C = X[:, :, ad["C"], :]
    Cb = get_virtual_atom(N, Ca, C, *constants.CB_WEIGHTS)

    na_ref = X[:, :, cfg.na_ref_atom_idx, :]
    X_ref = Ca + na_ref

    protein_mask = batch["protein_mask"].astype(X.dtype)
    if cfg.include_pred_na_N:
        O4p = X[:, :, ad["O4'"], :]
        C1p = X[:, :, ad["C1'"], :]
        C2p = X[:, :, ad["C2'"], :]
        N_na = get_virtual_atom(O4p, C1p, C2p, *constants.NA_N_WEIGHTS)
        na_mask = (batch["rna_mask"] + batch["dna_mask"]).astype(X.dtype)
        X_aug = jnp.concatenate([X, Cb[:, :, None, :], N_na[:, :, None, :]], axis=-2)
        X_m_aug = jnp.concatenate(
            [X_m.astype(X.dtype), protein_mask[:, :, None], na_mask[:, :, None]], axis=-1)
    else:
        X_aug = jnp.concatenate([X, Cb[:, :, None, :]], axis=-2)
        X_m_aug = jnp.concatenate([X_m.astype(X.dtype), protein_mask[:, :, None]], axis=-1)
    return X_aug, X_m_aug, X_ref


def _use_pallas_kernels(cfg: ModelConfig) -> bool:
    if cfg.kernels == "pallas":
        return True
    if cfg.kernels == "xla":
        return False
    # auto: Pallas on TPU-class backends only.
    return jax.default_backend() in ("tpu", "axon")


def features_apply(p, cfg: ModelConfig, batch, key: Optional[jax.Array] = None,
                   deterministic: bool = True):
    """Compute (V [B,L,node_features], E [B,L,K,edge_features], E_idx [B,L,K]).

    Mirrors reference ProteinFeatures.forward (na_model_utils.py:452-517) with
    per-edge (O(L*K)) offset/chain computation instead of the reference's
    [L,L] intermediates.
    """
    X = batch["X"]
    X_m = batch["X_m"]
    mask = batch["mask"]

    if not deterministic and key is not None and (
            cfg.protein_augment_eps > 0 or cfg.dna_augment_eps > 0 or cfg.rna_augment_eps > 0):
        X = augment_coordinates(X, X_m, batch, cfg, key)

    X_aug, X_m_aug, X_ref = build_augmented_atoms(X, X_m, batch, cfg)

    use_pallas = _use_pallas_kernels(cfg)
    if use_pallas:
        from ..ops import interpret_mode
        from ..ops.knn import knn_graph_pallas
        _, E_idx = knn_graph_pallas(X_ref, mask, cfg.k_neighbors,
                                    interpret=interpret_mode())
    else:
        _, E_idx = knn_graph(X_ref, mask, cfg.k_neighbors)

    # Relative position + same-chain indicator + neighbor mask, computed per
    # edge through ONE packed row-gather. XLA's TPU lowering serializes 1-D
    # (scalar) gathers at ~7 ns/row — ~1.4 ms EACH at the 6000-token shape,
    # measured in-situ — while a [B,L,C] row gather with C>=2 takes the
    # vectorized path (~0.2 ms total). All values are exact in f32
    # (ints < 2^24).
    from .modules import take_rows
    R_idx = batch["R_idx"].astype(jnp.int32)
    chain_labels = batch["chain_labels"].astype(jnp.int32)
    scalar_tab = jnp.stack(
        [R_idx.astype(jnp.float32), chain_labels.astype(jnp.float32),
         mask.astype(jnp.float32)], axis=-1)                   # [B,L,3]
    g = take_rows(scalar_tab, E_idx)                           # [B,L,K,3]
    offset = R_idx[:, :, None] - g[..., 0].astype(jnp.int32)
    E_chains = (chain_labels[:, :, None]
                == g[..., 1].astype(jnp.int32)).astype(jnp.int32)
    mask_attend = mask.astype(jnp.float32)[:, :, None] * g[..., 2]

    # Split edge embedding: W_edge rows [0:16) act on the positional block and
    # the rest on the RBF block — algebraically identical to embedding the
    # concatenation (reference na_model_utils.py:507-509). The RBF half is a
    # fused Pallas kernel on TPU (RBF + projection tile-wise in VMEM; the
    # [B,L,K,5184] tensor never reaches HBM).
    n_pos = cfg.num_positional_embeddings
    W = p["edge_embedding"]["w"]

    # Positional block folded THROUGH the projection: (table[d]+b) @ W_pos ==
    # (table @ W_pos)[d] + b @ W_pos — one [66,H] table row per edge instead
    # of a [B,L,K,16] gather plus a 16-deep (MXU-hostile) matmul. The row
    # lookup itself is a one-hot matmul, not jnp.take: the TPU lowering of a
    # [B,L,K]-indexed row gather is ~4 ms here (and its VJP is a scatter),
    # while one_hot @ table rides the MXU (~0.1 ms) with a matmul VJP.
    # Exactness: 65 of the 66 products per row are exact zeros, so the
    # result equals the gathered row bitwise in any dtype.
    d = jnp.clip(offset + cfg.max_relative_feature, 0,
                 2 * cfg.max_relative_feature)
    d = d * E_chains + (1 - E_chains) * (2 * cfg.max_relative_feature + 1)
    pos_table = jnp.dot(p["positional"]["w"], W[:n_pos])       # [66,H]
    pos_const = (jnp.dot(p["positional"]["b"], W[:n_pos])
                 if "b" in p["positional"] else 0.0)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else pos_table.dtype
    d_oh = jax.nn.one_hot(d, pos_table.shape[0], dtype=cdt)
    E_pos_proj = (jnp.dot(d_oh, pos_table.astype(cdt))
                  + jnp.asarray(pos_const, cdt))
    # The fused RBF kernels are specialized to the 18-atom backbone layout;
    # the 67-atom "all" table takes the shape-generic XLA path.
    if use_pallas and cfg.atom_table == "backbone":
        from ..ops import interpret_mode
        compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if cfg.rbf_mode == "classed":
            from ..ops.rbf_classed import rbf_edge_features_classed
            E_rbf = rbf_edge_features_classed(X_aug, X_m_aug, E_idx, W[n_pos:],
                                              compute_dtype=compute_dtype,
                                              interpret=interpret_mode())
        else:
            from ..ops.rbf_edge import rbf_edge_features
            E_rbf = rbf_edge_features(X_aug, X_m_aug, E_idx, W[n_pos:],
                                      compute_dtype=compute_dtype,
                                      interpret=interpret_mode())
    else:
        RBF_all = all_pair_rbf(X_aug, E_idx, X_m_aug, cfg.num_rbf)
        E_rbf = jnp.dot(RBF_all, W[n_pos:])
    E = E_pos_proj + E_rbf
    E = layer_norm(p["norm_edges"], E)

    V = jax.nn.one_hot(batch["R_polymer_type"], cfg.num_polytypes,
                       dtype=p["node_embedding"]["w"].dtype)
    V = linear(p["node_embedding"], V)
    V = layer_norm(p["norm_nodes"], V)
    return V, E, E_idx, mask_attend


def init_features(key, cfg: ModelConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return {
        "positional": init_linear(ks[0], 2 * cfg.max_relative_feature + 2,
                                  cfg.num_positional_embeddings, dtype=dtype),
        "node_embedding": init_linear(ks[1], cfg.node_in, cfg.node_features,
                                      bias=False, dtype=dtype),
        "norm_nodes": init_layer_norm(cfg.node_features, dtype),
        "edge_embedding": init_linear(ks[2], cfg.edge_in, cfg.edge_features,
                                      bias=False, dtype=dtype),
        "norm_edges": init_layer_norm(cfg.edge_features, dtype),
    }
