"""Functional building blocks of the NA-MPNN message-passing network.

Pure-function JAX modules operating on parameter pytrees (nested dicts).
Numerical semantics mirror the reference network (reference
na_model_utils.py:196-334) so reference-trained weights can be imported and
validated layer-by-layer:

* Linear weights are stored ``[in, out]`` (x @ w + b).
* GELU is the exact (erf) variant, matching ``torch.nn.GELU()``.
* LayerNorm uses eps=1e-5, matching ``torch.nn.LayerNorm`` defaults.
* The neighbor-sum message aggregation divides by ``scale`` = 30.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

LN_EPS = 1e-5
MESSAGE_SCALE = 30.0


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def gelu(x):
    """Exact (erf) GELU; reference uses torch.nn.GELU() (erf form)."""
    return jax.nn.gelu(x, approximate=False)


def linear(p, x):
    return jnp.dot(x, p["w"]) + p["b"] if "b" in p else jnp.dot(x, p["w"])


def layer_norm(p, x):
    # Statistics in (at least) fp32 even when activations are bf16.
    stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(stat_dtype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _bulk_mask_key(key):
    """Derive an `unsafe_rbg` key (lowered to XLA RngBitGenerator — an order
    of magnitude cheaper per word than threefry on TPU) for BULK mask draws.
    Purely a function of `key`, so determinism-per-key is preserved; the
    derivation itself is one 4-word threefry draw."""
    data = jax.random.bits(key, (4,), jnp.uint32)
    return jax.random.wrap_key_data(data, impl="unsafe_rbg")


def dropout(x, rate: float, key: Optional[jax.Array], deterministic: bool):
    if deterministic or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(_bulk_mask_key(key), p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Graph gathers (the sparse primitives; reference na_model_utils.py:168-193)
# ---------------------------------------------------------------------------

def take_rows(x, idx):
    """Per-batch row gather: x [B,L,...], idx [B,...] int -> out[b,t]=x[b,idx[b,t]]
    with out.shape = idx.shape + x.shape[2:].

    Lowered as ONE flat row-gather over [B*L, C]: `take_along_axis` with
    broadcast multi-dim indices lowers to an elementwise gather whose index
    tensor is the full output shape — measured 2.2 s for a 188 MB operand on
    the TPU relay, vs ~1 ms for this form."""
    B, L = x.shape[:2]
    rest = x.shape[2:]
    x2 = x.reshape(B * L, -1)
    flat = (jnp.arange(B, dtype=jnp.int32).reshape((B,) + (1,) * (idx.ndim - 1))
            * L + idx).reshape(-1)
    out = jnp.take(x2, flat, axis=0, mode="clip")
    return out.reshape(idx.shape + rest)


def gather_nodes(nodes, neighbor_idx):
    """Features [B,L,C] at neighbor indices [B,L,K] -> [B,L,K,C]."""
    return take_rows(nodes, neighbor_idx)


def gather_edges(edges, neighbor_idx):
    """Features [B,L,L,C] at neighbor indices [B,L,K] -> [B,L,K,C]."""
    return jnp.take_along_axis(edges, neighbor_idx[..., None], axis=2)


def gather_nodes_t(nodes, neighbor_idx):
    """Features [B,L,C] at per-batch index [B,K] -> [B,K,C]."""
    return jnp.take_along_axis(nodes, neighbor_idx[..., None], axis=1)


def cat_neighbors_nodes(h_nodes, h_neighbors, E_idx):
    """concat([h_E(ij), h_V(j)]) along features: [B,L,K,Ce+Cv]."""
    return jnp.concatenate([h_neighbors, gather_nodes(h_nodes, E_idx)], axis=-1)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def pff_apply(p, h_V):
    """Position-wise feed-forward (reference na_model_utils.py:325-334)."""
    return linear(p["W_out"], gelu(linear(p["W_in"], h_V)))


def _message_mlp(p, h_EV, w1="W1", w2="W2", w3="W3"):
    return linear(p[w3], gelu(linear(p[w2], gelu(linear(p[w1], h_EV)))))


def _split_w1(p, H, name="W1"):
    """View the [cH, H] concat weight as c per-block [H, H] weights."""
    w = p[name]["w"]
    c = w.shape[0] // H
    return [w[i * H:(i + 1) * H] for i in range(c)], p[name]["b"]


def _message_tail(p, x, w2="W2", w3="W3"):
    return linear(p[w3], gelu(linear(p[w2], gelu(x))))


def enc_layer_apply(p, h_V, h_E, E_idx, mask_V=None, mask_attend=None,
                    dropout_rate=0.0, key=None, deterministic=True):
    """Encoder layer: node update + edge update.

    Mirrors reference EncLayer.forward (na_model_utils.py:218-241) with the
    concat->W1 matmul split algebraically into per-block terms:
        cat(h_Vi, h_E, h_Vj) @ W1 = h_V@W1a |i + h_E@W1b + gather(h_V@W1c)
    — the [B,L,K,3H] concat never materializes and the node blocks cost H^2
    per node instead of per edge.
    h_V: [B,L,H]; h_E: [B,L,K,H]; E_idx: [B,L,K].
    """
    if not deterministic and key is not None:
        k1, k2, k3 = jax.random.split(key, 3)
    else:
        k1 = k2 = k3 = None
    H = h_V.shape[-1]

    def edge_message(h_V, w1_name, w2_name, w3_name):
        (wa, wb, wc), b1 = _split_w1(p, H, w1_name)
        x = (jnp.dot(h_V, wa)[:, :, None, :]
             + jnp.dot(h_E, wb)
             + gather_nodes(jnp.dot(h_V, wc), E_idx) + b1)
        return _message_tail(p, x, w2_name, w3_name)

    h_message = edge_message(h_V, "W1", "W2", "W3")
    if mask_attend is not None:
        h_message = mask_attend[..., None] * h_message
    dh = jnp.sum(h_message, axis=-2) / MESSAGE_SCALE
    h_V = layer_norm(p["norm1"], h_V + dropout(dh, dropout_rate, k1, deterministic))

    dh = pff_apply(p["dense"], h_V)
    h_V = layer_norm(p["norm2"], h_V + dropout(dh, dropout_rate, k2, deterministic))
    if mask_V is not None:
        h_V = mask_V[..., None] * h_V

    h_message = edge_message(h_V, "W11", "W12", "W13")
    h_E = layer_norm(p["norm3"], h_E + dropout(h_message, dropout_rate, k3, deterministic))
    return h_V, h_E


def dec_layer_apply(p, h_V, h_E, mask_V=None, mask_attend=None,
                    dropout_rate=0.0, key=None, deterministic=True):
    """Decoder layer: node-only update on pre-gathered edge context.

    Mirrors reference DecLayer.forward (na_model_utils.py:262-283).
    h_V: [B,L,H]; h_E: [B,L,K,C] where C = 3H for the NA-MPNN decoder.
    """
    if not deterministic and key is not None:
        k1, k2 = jax.random.split(key)
    else:
        k1 = k2 = None

    h_V_expand = jnp.broadcast_to(h_V[:, :, None, :], h_E.shape[:-1] + (h_V.shape[-1],))
    h_EV = jnp.concatenate([h_V_expand, h_E], axis=-1)
    h_message = _message_mlp(p, h_EV)
    if mask_attend is not None:
        h_message = mask_attend[..., None] * h_message
    dh = jnp.sum(h_message, axis=-2) / MESSAGE_SCALE
    h_V = layer_norm(p["norm1"], h_V + dropout(dh, dropout_rate, k1, deterministic))

    dh = pff_apply(p["dense"], h_V)
    h_V = layer_norm(p["norm2"], h_V + dropout(dh, dropout_rate, k2, deterministic))
    if mask_V is not None:
        h_V = mask_V[..., None] * h_V
    return h_V


# ---------------------------------------------------------------------------
# Initializers (xavier_uniform for >1D like the reference, zero bias)
# ---------------------------------------------------------------------------

def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def init_linear(key, d_in, d_out, bias=True, dtype=jnp.float32):
    p = {"w": _xavier_uniform(key, (d_in, d_out), dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_layer_norm(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_pff(key, d_hidden, d_ff, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "W_in": init_linear(k1, d_hidden, d_ff, dtype=dtype),
        "W_out": init_linear(k2, d_ff, d_hidden, dtype=dtype),
    }


def init_enc_layer(key, d_hidden, d_in, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    return {
        "W1": init_linear(ks[0], d_hidden + d_in, d_hidden, dtype=dtype),
        "W2": init_linear(ks[1], d_hidden, d_hidden, dtype=dtype),
        "W3": init_linear(ks[2], d_hidden, d_hidden, dtype=dtype),
        "W11": init_linear(ks[3], d_hidden + d_in, d_hidden, dtype=dtype),
        "W12": init_linear(ks[4], d_hidden, d_hidden, dtype=dtype),
        "W13": init_linear(ks[5], d_hidden, d_hidden, dtype=dtype),
        "norm1": init_layer_norm(d_hidden, dtype),
        "norm2": init_layer_norm(d_hidden, dtype),
        "norm3": init_layer_norm(d_hidden, dtype),
        "dense": init_pff(ks[6], d_hidden, d_hidden * 4, dtype),
    }


def init_dec_layer(key, d_hidden, d_in, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "W1": init_linear(ks[0], d_hidden + d_in, d_hidden, dtype=dtype),
        "W2": init_linear(ks[1], d_hidden, d_hidden, dtype=dtype),
        "W3": init_linear(ks[2], d_hidden, d_hidden, dtype=dtype),
        "norm1": init_layer_norm(d_hidden, dtype),
        "norm2": init_layer_norm(d_hidden, dtype),
        "dense": init_pff(ks[3], d_hidden, d_hidden * 4, dtype),
    }
