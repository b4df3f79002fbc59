"""Fused MPNN layer kernels (Pallas TPU): message MLP + aggregation + norms.

One kernel invocation per layer update instead of the ~6 XLA fusion groups of
the unfused path, with every [T*K, H] intermediate (message MLP activations,
masked messages) living in VMEM. The only remaining HBM traffic per layer is
the edge features, the pre-gathered neighbor term, and the node vectors.

The gather of neighbor node features stays in XLA (one op): node features are
[L, H] — 30x smaller than the edge tensors this kernel keeps out of HBM.

Used on the deterministic (inference) path; training uses the autodiff-able
XLA formulation in models.modules (same math — parity-tested).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.modules import LN_EPS, MESSAGE_SCALE

NODE_TILE = 16  # residues per grid step (x K edges each)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (max abs error
    1.5e-7) — Mosaic implements neither erf nor erfc."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # Exact-form (erf) GELU to match torch.nn.GELU(); the erf itself is the
    # 1.5e-7-accurate approximation above.
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * 0.7071067811865476))).astype(x.dtype)


def _ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * scale + bias).astype(x.dtype)


def _dotp(a, b, compute_dtype):
    precision = (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    return jnp.dot(a.astype(compute_dtype), b.astype(compute_dtype),
                   preferred_element_type=jnp.float32, precision=precision)


def _rep_rows(a, K):
    """Exact row broadcast [T, H] -> [T*K, H] (row i copied to rows i*K..).

    Replaces the rep-matrix matmul: that [T*K, T] @ [T, H] dot costs
    2*T*K*H*T flops (quadratic in the node tile T) with a T-deep — MXU-
    hostile — contraction; this is a VPU broadcast+reshape, O(T*K*H)."""
    T, H = a.shape
    return jnp.broadcast_to(a[:, None, :], (T, K, H)).reshape(T * K, H)


def _seg_sum(m, K):
    """Exact per-node neighbor sum [T*K, H] -> [T, H] (fp32 accumulation).

    Replaces the seg-matrix matmul (same quadratic-in-T cost as _rep_rows)."""
    TK, H = m.shape
    return jnp.sum(m.astype(jnp.float32).reshape(TK // K, K, H), axis=1)


def _node_update_kernel(h_V_ref, h_E_ref, G_ref, static_ref, mask_att_ref,
                        mask_ref, wa_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                        b3_ref, n1s_ref, n1b_ref, win_ref, bin_ref, wout_ref,
                        bout_ref, n2s_ref, n2b_ref, out_ref, *, K,
                        compute_dtype, has_static):
    h_V = h_V_ref[:]
    a_i = _dotp(h_V, wa_ref[:], compute_dtype)                     # [T,H]
    a_edges = _rep_rows(a_i, K)                                     # [T*K,H]
    x = a_edges + G_ref[:] + b1_ref[:]
    if has_static:
        # decoder: h_E slot carries the precomputed static edge terms
        x = x + h_E_ref[:]
    else:
        # encoder: static slot carries wb; contract the edge features here
        x = x + _dotp(h_E_ref[:], static_ref[:], compute_dtype)

    m = _dotp(_gelu(x), w2_ref[:], compute_dtype) + b2_ref[:]
    m = _dotp(_gelu(m), w3_ref[:], compute_dtype) + b3_ref[:]
    m = m * mask_att_ref[:]
    dh = _seg_sum(m, K) / MESSAGE_SCALE

    h = _ln(h_V.astype(jnp.float32) + dh, n1s_ref[:], n1b_ref[:])
    ff = _dotp(_gelu(_dotp(h, win_ref[:], compute_dtype) + bin_ref[:]),
               wout_ref[:], compute_dtype) + bout_ref[:]
    h = _ln(h.astype(jnp.float32) + ff, n2s_ref[:], n2b_ref[:])
    out_ref[:] = (h * mask_ref[:]).astype(out_ref.dtype)


def _edge_update_kernel(h_V_ref, h_E_ref, G_ref, wa_ref, wb_ref, b1_ref,
                        w2_ref, b2_ref, w3_ref, b3_ref, n3s_ref, n3b_ref,
                        out_ref, *, K, compute_dtype):
    a_i = _dotp(h_V_ref[:], wa_ref[:], compute_dtype)
    a_edges = _rep_rows(a_i, K)
    x = a_edges + _dotp(h_E_ref[:], wb_ref[:], compute_dtype) + G_ref[:] + b1_ref[:]
    m = _dotp(_gelu(x), w2_ref[:], compute_dtype) + b2_ref[:]
    m = _dotp(_gelu(m), w3_ref[:], compute_dtype) + b3_ref[:]
    out_ref[:] = _ln(h_E_ref[:].astype(jnp.float32) + m, n3s_ref[:],
                     n3b_ref[:]).astype(out_ref.dtype)


def _row(x):
    return jnp.asarray(x)[None, :]


def _grid_specs_node(T, K, H, Hff):
    def tile2(r, c, imap):
        return pl.BlockSpec((r, c), imap, memory_space=pltpu.VMEM)
    edge_map = lambda i: (i, 0)
    node_map = lambda i: (i, 0)
    full = lambda i: (0, 0)
    in_specs = [
        tile2(T, H, node_map),            # h_V
        tile2(T * K, H, edge_map),        # h_E (or precomputed static terms)
        tile2(T * K, H, edge_map),        # G
        tile2(H, H, full),                # wb (unused when has_static)
        tile2(T * K, 1, edge_map),        # mask_attend
        tile2(T, 1, node_map),            # mask
        tile2(H, H, full),                # wa
        tile2(1, H, full),                # b1
        tile2(H, H, full), tile2(1, H, full),   # W2
        tile2(H, H, full), tile2(1, H, full),   # W3
        tile2(1, H, full), tile2(1, H, full),   # norm1
        tile2(H, Hff, full), tile2(1, Hff, full),  # dense W_in
        tile2(Hff, H, full), tile2(1, H, full),    # dense W_out
        tile2(1, H, full), tile2(1, H, full),      # norm2
    ]
    out_spec = tile2(T, H, node_map)
    return in_specs, out_spec


@functools.partial(jax.jit, static_argnames=("K", "compute_dtype", "has_static",
                                             "interpret"))
def fused_node_update(h_V, h_E_flat, G_flat, static_or_wb, mask_att_flat,
                      mask_col, p, K, compute_dtype=jnp.float32,
                      has_static=False, interpret=False):
    """One MPNN node update: h_V [N,H]; h_E_flat/G_flat [N*K,H];
    static_or_wb: per-edge static term [N*K,H] (decoder) or the wb weight
    [H,H] (encoder, h_E@wb computed in-kernel); mask_att_flat [N*K,1];
    mask_col [N,1]. p: layer params (modules layout). Returns updated h_V."""
    N, H = h_V.shape
    T = NODE_TILE
    assert N % T == 0, (N, T)
    Hff = p["dense"]["W_in"]["w"].shape[1]
    in_specs, out_spec = _grid_specs_node(T, K, H, Hff)
    kernel = functools.partial(_node_update_kernel, K=K,
                               compute_dtype=compute_dtype,
                               has_static=has_static)
    return pl.pallas_call(
        kernel, grid=(N // T,),
        in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, H), h_V.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * H * H * 3 + 2 * N * H * Hff * 2,
            bytes_accessed=(N * K * H * (3 if has_static else 2) + N * H * 2) * 4,
            transcendentals=N * K * H * 2,
        ),
        interpret=interpret,
    )(h_V, h_E_flat, G_flat, static_or_wb, mask_att_flat, mask_col,
      p["W1"]["w"][:H], _row(p["W1"]["b"]),
      p["W2"]["w"], _row(p["W2"]["b"]), p["W3"]["w"], _row(p["W3"]["b"]),
      _row(p["norm1"]["scale"]), _row(p["norm1"]["bias"]),
      p["dense"]["W_in"]["w"], _row(p["dense"]["W_in"]["b"]),
      p["dense"]["W_out"]["w"], _row(p["dense"]["W_out"]["b"]),
      _row(p["norm2"]["scale"]), _row(p["norm2"]["bias"]))


@functools.partial(jax.jit, static_argnames=("K", "compute_dtype", "interpret"))
def fused_edge_update(h_V, h_E_flat, G_flat, p, K, compute_dtype=jnp.float32,
                      interpret=False):
    """Encoder edge update (W11-13 + norm3): returns updated h_E_flat."""
    N, H = h_V.shape
    T = NODE_TILE
    assert N % T == 0
    kernel = functools.partial(_edge_update_kernel, K=K,
                               compute_dtype=compute_dtype)

    def tile2(r, c, imap):
        return pl.BlockSpec((r, c), imap, memory_space=pltpu.VMEM)
    edge_map = lambda i: (i, 0)
    node_map = lambda i: (i, 0)
    full = lambda i: (0, 0)
    return pl.pallas_call(
        kernel, grid=(N // T,),
        in_specs=[
            tile2(T, H, node_map), tile2(T * K, H, edge_map),
            tile2(T * K, H, edge_map),
            tile2(H, H, full), tile2(H, H, full), tile2(1, H, full),
            tile2(H, H, full), tile2(1, H, full),
            tile2(H, H, full), tile2(1, H, full),
            tile2(1, H, full), tile2(1, H, full),
        ],
        out_specs=tile2(T * K, H, edge_map),
        out_shape=jax.ShapeDtypeStruct((N * K, H), h_E_flat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * H * H * 3,
            bytes_accessed=N * K * H * 3 * 4,
            transcendentals=N * K * H * 2,
        ),
        interpret=interpret,
    )(h_V, h_E_flat, G_flat,
      p["W11"]["w"][:H], p["W11"]["w"][H:2 * H], _row(p["W11"]["b"]),
      p["W12"]["w"], _row(p["W12"]["b"]), p["W13"]["w"], _row(p["W13"]["b"]),
      _row(p["norm3"]["scale"]), _row(p["norm3"]["bias"]))


# ---------------------------------------------------------------------------
# Layer-level wrappers (batched; flatten B*L -> N)
# ---------------------------------------------------------------------------

def _round_up(x, m):
    return (x + m - 1) // m * m


def _flatten_edges(x, N_pad=None):
    B, L, K, H = x.shape
    out = x.reshape(B * L * K, H)
    if N_pad is not None and N_pad != B * L:
        out = jnp.pad(out, ((0, (N_pad - B * L) * K), (0, 0)))
    return out


def _flatten_nodes(x, N_pad=None):
    B, L = x.shape[:2]
    out = x.reshape(B * L, *x.shape[2:])
    if N_pad is not None and N_pad != B * L:
        pad = [(0, N_pad - B * L)] + [(0, 0)] * (out.ndim - 1)
        out = jnp.pad(out, pad)
    return out


def enc_layer_fused(p, h_V, h_E, E_idx, mask, mask_attend,
                    compute_dtype=jnp.float32, interpret=False):
    """Fused-kernels encoder layer; same math as modules.enc_layer_apply
    (deterministic mode)."""
    from ..models.modules import gather_nodes

    B, L, K, H = h_E.shape
    N = B * L
    Np = _round_up(N, NODE_TILE)
    h_V2 = _flatten_nodes(h_V, Np)
    h_E2 = _flatten_edges(h_E, Np)
    mask_col = _flatten_nodes(mask[..., None], Np).astype(h_V.dtype)
    mask_att2 = _flatten_edges(mask_attend[..., None], Np).astype(h_V.dtype)

    wc = p["W1"]["w"][2 * H:]
    wb = p["W1"]["w"][H:2 * H]
    G = _flatten_edges(gather_nodes(jnp.dot(h_V, wc), E_idx), Np)
    h_V_new2 = fused_node_update(h_V2, h_E2, G, wb, mask_att2, mask_col, p, K,
                                 compute_dtype=compute_dtype,
                                 has_static=False, interpret=interpret)
    h_V_new = h_V_new2[:N].reshape(B, L, H)

    wc11 = p["W11"]["w"][2 * H:]
    G11 = _flatten_edges(gather_nodes(jnp.dot(h_V_new, wc11), E_idx), Np)
    h_E_new2 = fused_edge_update(h_V_new2, h_E2, G11, p, K,
                                 compute_dtype=compute_dtype,
                                 interpret=interpret)
    return h_V_new, h_E_new2[:N * K].reshape(B, L, K, H)


def dec_layer_fused(p, h_V, static_edges, G_v_masked, mask,
                    compute_dtype=jnp.float32, interpret=False):
    """Fused decoder layer: static_edges = e+s+venc terms [B,L,K,H] (per
    layer, precomputed), G_v_masked = mask_bw * gather(h_V @ wv) [B,L,K,H]."""
    B, L, K, H = static_edges.shape
    N = B * L
    Np = _round_up(N, NODE_TILE)
    ones_att = jnp.ones((Np * K, 1), h_V.dtype)
    dummy_wb = jnp.zeros((H, H), h_V.dtype)
    h_V_new = fused_node_update(
        _flatten_nodes(h_V, Np), _flatten_edges(static_edges, Np),
        _flatten_edges(G_v_masked, Np), dummy_wb, ones_att,
        _flatten_nodes(mask[..., None], Np).astype(h_V.dtype), p, K,
        compute_dtype=compute_dtype, has_static=True, interpret=interpret)
    return h_V_new[:N].reshape(B, L, H)
