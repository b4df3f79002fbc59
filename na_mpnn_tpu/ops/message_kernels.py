"""Differentiable fused message-MLP kernels (Pallas TPU, custom VJP).

These kernels carry the FLOP bulk of every MPNN layer — the 3-matmul GELU
message MLP over all B*L*K edges (reference EncLayer/DecLayer,
na_model_utils.py:196-283) — in one Pallas call each, for BOTH training and
inference. The [T*K, H] message activations live in VMEM; the backward pass
is a second Pallas kernel that recomputes the tile's activations
(rematerialization — the same FLOPs-for-HBM trade the reference makes with
torch.utils.checkpoint, na_model_utils.py:606,637) and emits input gradients
plus accumulated weight gradients.

Two variants share the kernels via static flags:

* ``aggregate=True``  -> returns the masked neighbor-sum dh [N, H] /30
  (node update input to LayerNorm; reference :232-236).
* ``aggregate=False`` -> returns the per-edge message m [N*K, H]
  (encoder edge update; reference :238-240).
* ``contract_e=True``  -> the edge operand is contracted with wb in-kernel
  (encoder: x += h_E @ W1b). ``False`` -> added directly (decoder: the
  operand is the precomputed static edge term).

Dropout and the node-level LayerNorm/FFN tail stay in XLA: they are O(N*H)
ops XLA fuses well, and keeping them outside gives ordinary autodiff
through the residual/norm structure.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.modules import MESSAGE_SCALE
from .fused_layers import _dotp, _gelu, _rep_seg_matrices

NODE_TILE = 16  # nodes per grid step (x K edges each)


def _gelu_grad(x):
    """d/dx gelu(x) = Phi(x) + x * phi(x), with the A&S erf approximation
    (Mosaic has no erf)."""
    from .fused_layers import _erf
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf(xf * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * xf * xf) * 0.3989422804014327
    return cdf + xf * pdf


def _compute_x(h_V, e_in, G, wa_ref, wb_ref, b1_ref, rep, compute_dtype,
               contract_e):
    a_i = _dotp(h_V, wa_ref[:], compute_dtype)
    a_edges = jnp.dot(rep, a_i, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    x = a_edges + G + b1_ref[:]
    if contract_e:
        x = x + _dotp(e_in, wb_ref[:], compute_dtype)
    else:
        x = x + e_in
    return x


def _fwd_kernel(h_V_ref, e_in_ref, G_ref, mask_att_ref, wa_ref, wb_ref,
                b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref, *, K,
                compute_dtype, contract_e, aggregate):
    T = h_V_ref.shape[0]
    rep, seg = _rep_seg_matrices(T, K)
    x = _compute_x(h_V_ref[:], e_in_ref[:], G_ref[:], wa_ref, wb_ref, b1_ref,
                   rep, compute_dtype, contract_e)
    m = _dotp(_gelu(x), w2_ref[:], compute_dtype) + b2_ref[:]
    m = _dotp(_gelu(m), w3_ref[:], compute_dtype) + b3_ref[:]
    if aggregate:
        m = m * mask_att_ref[:]
        out_ref[:] = (jnp.dot(seg, m, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                      / MESSAGE_SCALE).astype(out_ref.dtype)
    else:
        out_ref[:] = m.astype(out_ref.dtype)


def _bwd_kernel(h_V_ref, e_in_ref, G_ref, mask_att_ref, wa_ref, wb_ref,
                b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, g_ref,
                g_hV_ref, g_ein_ref, g_G_ref, dwa_ref, dwb_ref, db1_ref,
                dw2_ref, db2_ref, dw3_ref, db3_ref, *, K, compute_dtype,
                contract_e, aggregate):
    T = h_V_ref.shape[0]
    rep, seg = _rep_seg_matrices(T, K)
    h_V = h_V_ref[:]
    e_in = e_in_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dwa_ref, dwb_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
                  db3_ref):
            r[:] = jnp.zeros_like(r)

    # Recompute the tile's activations (remat).
    x = _compute_x(h_V, e_in, G_ref[:], wa_ref, wb_ref, b1_ref, rep,
                   compute_dtype, contract_e)
    u1 = _gelu(x)
    y = _dotp(u1, w2_ref[:], compute_dtype) + b2_ref[:]
    u2 = _gelu(y)

    # Cotangent of the per-edge message m.
    if aggregate:
        g_m = jnp.dot(rep, g_ref[:].astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        g_m = g_m * (mask_att_ref[:] / MESSAGE_SCALE)
    else:
        g_m = g_ref[:].astype(jnp.float32)

    def dotT_acc(a, b):  # a^T @ b with fp32 accumulation
        return jax.lax.dot_general(
            a.astype(compute_dtype), b.astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(compute_dtype))

    def dotB(a, w):  # a @ w^T
        return jax.lax.dot_general(
            a.astype(compute_dtype), w.astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(compute_dtype))

    dw3_ref[:] += dotT_acc(u2, g_m)
    db3_ref[:] += jnp.sum(g_m, axis=0, keepdims=True)
    g_y = dotB(g_m, w3_ref[:]) * _gelu_grad(y)
    dw2_ref[:] += dotT_acc(u1, g_y)
    db2_ref[:] += jnp.sum(g_y, axis=0, keepdims=True)
    g_x = dotB(g_y, w2_ref[:]) * _gelu_grad(x)

    db1_ref[:] += jnp.sum(g_x, axis=0, keepdims=True)
    g_G_ref[:] = g_x.astype(g_G_ref.dtype)
    if contract_e:
        g_ein_ref[:] = dotB(g_x, wb_ref[:]).astype(g_ein_ref.dtype)
        dwb_ref[:] += dotT_acc(e_in, g_x)
    else:
        g_ein_ref[:] = g_x.astype(g_ein_ref.dtype)

    s = jnp.dot(seg, g_x, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # [T, H]
    g_hV_ref[:] = dotB(s, wa_ref[:]).astype(g_hV_ref.dtype)
    dwa_ref[:] += dotT_acc(h_V, s)


def _prec(compute_dtype):
    return (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _specs(T, K, H, aggregate, for_bwd):
    node = pl.BlockSpec((T, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    edge = pl.BlockSpec((T * K, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    edge1 = pl.BlockSpec((T * K, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [node, edge, edge, edge1, mat, mat, row, mat, row, mat, row]
    if for_bwd:
        in_specs = in_specs + [node if aggregate else edge]  # cotangent
        out_specs = [node, edge, edge, mat, mat, row, mat, row, mat, row]
        return in_specs, out_specs
    return in_specs, (node if aggregate else edge)


@functools.partial(jax.jit, static_argnames=("K", "compute_dtype",
                                             "contract_e", "aggregate",
                                             "interpret"))
def _message_fwd_call(h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3,
                      K, compute_dtype, contract_e, aggregate, interpret):
    N, H = h_V.shape
    T = NODE_TILE
    assert N % T == 0, (N, T)
    in_specs, out_spec = _specs(T, K, H, aggregate, for_bwd=False)
    kernel = functools.partial(_fwd_kernel, K=K, compute_dtype=compute_dtype,
                               contract_e=contract_e, aggregate=aggregate)
    out_shape = jax.ShapeDtypeStruct((N, H) if aggregate else (N * K, H),
                                     h_V.dtype)
    return pl.pallas_call(
        kernel, grid=(N // T,), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * H * H * (3 if contract_e else 2),
            bytes_accessed=(N * K * H * 3 + N * H * 2) * 4,
            transcendentals=N * K * H * 2,
        ),
        interpret=interpret,
    )(h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3)


@functools.partial(jax.jit, static_argnames=("K", "compute_dtype",
                                             "contract_e", "aggregate",
                                             "interpret"))
def _message_bwd_call(h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3, g,
                      K, compute_dtype, contract_e, aggregate, interpret):
    N, H = h_V.shape
    T = NODE_TILE
    in_specs, out_specs = _specs(T, K, H, aggregate, for_bwd=True)
    kernel = functools.partial(_bwd_kernel, K=K, compute_dtype=compute_dtype,
                               contract_e=contract_e, aggregate=aggregate)
    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((N, H), h_V.dtype),       # g_hV
        jax.ShapeDtypeStruct((N * K, H), e_in.dtype),  # g_ein
        jax.ShapeDtypeStruct((N * K, H), G.dtype),     # g_G
        jax.ShapeDtypeStruct((H, H), f32),             # dwa
        jax.ShapeDtypeStruct((H, H), f32),             # dwb
        jax.ShapeDtypeStruct((1, H), f32),             # db1
        jax.ShapeDtypeStruct((H, H), f32),             # dw2
        jax.ShapeDtypeStruct((1, H), f32),             # db2
        jax.ShapeDtypeStruct((H, H), f32),             # dw3
        jax.ShapeDtypeStruct((1, H), f32),             # db3
    ]
    return pl.pallas_call(
        kernel, grid=(N // T,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * H * H * (3 if contract_e else 2) * 2,
            bytes_accessed=(N * K * H * 5 + N * H * 4) * 4,
            transcendentals=N * K * H * 4,
        ),
        interpret=interpret,
    )(h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def message_mlp(h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3,
                K, compute_dtype, contract_e, aggregate, interpret):
    """Fused edge message MLP.

    h_V [N,H]; e_in [N*K,H] (edge features or precomputed static terms);
    G [N*K,H] pre-gathered neighbor term; mask_att [N*K,1].
    aggregate=True -> masked neighbor mean dh [N,H]; False -> per-edge
    messages [N*K,H]. Fully differentiable (mask_att is structural).
    """
    return _message_fwd_call(h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3,
                             b3, K, compute_dtype, contract_e, aggregate,
                             interpret)


def _message_mlp_fwd(h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3,
                     K, compute_dtype, contract_e, aggregate, interpret):
    out = message_mlp(h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3,
                      K, compute_dtype, contract_e, aggregate, interpret)
    return out, (h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3)


def _message_mlp_bwd(K, compute_dtype, contract_e, aggregate, interpret,
                     res, g):
    h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3 = res
    (g_hV, g_ein, g_G, dwa, dwb, db1, dw2, db2, dw3, db3) = _message_bwd_call(
        h_V, e_in, G, mask_att, wa, wb, b1, w2, b2, w3, b3, g,
        K, compute_dtype, contract_e, aggregate, interpret)
    if not contract_e:
        dwb = jnp.zeros_like(wb)
    return (g_hV, g_ein, g_G, jnp.zeros_like(mask_att),
            dwa.astype(wa.dtype), dwb.astype(wb.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype),
            db2.astype(b2.dtype), dw3.astype(w3.dtype),
            db3.astype(b3.dtype))


message_mlp.defvjp(_message_mlp_fwd, _message_mlp_bwd)


# ---------------------------------------------------------------------------
# Layer-level wrappers (differentiable; used by training AND inference paths)
# ---------------------------------------------------------------------------

def _round_up(x, m):
    return (x + m - 1) // m * m


def _flat_nodes(x, Np):
    B, L = x.shape[:2]
    out = x.reshape(B * L, *x.shape[2:])
    if Np != B * L:
        out = jnp.pad(out, [(0, Np - B * L)] + [(0, 0)] * (out.ndim - 1))
    return out


def _flat_edges(x, Np):
    B, L, K, H = x.shape
    out = x.reshape(B * L * K, H)
    if Np != B * L:
        out = jnp.pad(out, ((0, (Np - B * L) * K), (0, 0)))
    return out


def message_agg_batched(p, h_V, e_in, G, mask_att, *, contract_e,
                        compute_dtype=jnp.float32, w1="W1", w2="W2", w3="W3",
                        interpret=False):
    """Batched node-message aggregation: h_V [B,L,H], e_in/G [B,L,K,H],
    mask_att [B,L,K] -> dh [B,L,H] (pre-dropout / pre-LayerNorm)."""
    B, L, K, H = e_in.shape
    N = B * L
    Np = _round_up(N, NODE_TILE)
    wsplit = p[w1]["w"]
    wa = wsplit[:H]
    wb = wsplit[H:2 * H] if contract_e else jnp.zeros((H, H), wsplit.dtype)
    dh = message_mlp(
        _flat_nodes(h_V, Np), _flat_edges(e_in, Np), _flat_edges(G, Np),
        _flat_edges(mask_att[..., None], Np).astype(h_V.dtype),
        wa, wb, p[w1]["b"][None, :], p[w2]["w"], p[w2]["b"][None, :],
        p[w3]["w"], p[w3]["b"][None, :],
        K, compute_dtype, contract_e, True, interpret)
    return dh[:N].reshape(B, L, H)


def message_edge_batched(p, h_V, h_E, G, *, compute_dtype=jnp.float32,
                         w1="W11", w2="W12", w3="W13", interpret=False):
    """Batched per-edge message (encoder edge update): -> m [B,L,K,H]."""
    B, L, K, H = h_E.shape
    N = B * L
    Np = _round_up(N, NODE_TILE)
    wsplit = p[w1]["w"]
    dummy_att = jnp.ones((Np * K, 1), h_V.dtype)
    m = message_mlp(
        _flat_nodes(h_V, Np), _flat_edges(h_E, Np), _flat_edges(G, Np),
        dummy_att, wsplit[:H], wsplit[H:2 * H], p[w1]["b"][None, :],
        p[w2]["w"], p[w2]["b"][None, :], p[w3]["w"], p[w3]["b"][None, :],
        K, compute_dtype, True, False, interpret)
    return m[:N * K].reshape(B, L, K, H)
