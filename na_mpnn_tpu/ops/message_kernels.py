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

import os

from ..models.modules import MESSAGE_SCALE
from .fused_layers import _dotp, _gelu, _rep_rows, _seg_sum

# Nodes per grid step (x K edges each). 32 measured best on v5e at the
# 6000-token training shape once the decoder table narrowed to 2H columns
# (interleaved in-process A/B: 45.0 vs 46.2 ms device train step; with the
# old 3H table T=32 overflowed the 16MB scoped-VMEM limit, which is why
# earlier rounds shipped 16). Overridable for sweeps via env.


def _node_tile_from_env() -> int:
    raw = os.environ.get("NA_MPNN_NODE_TILE", "32")
    try:
        t = int(raw)
    except ValueError as e:
        raise ValueError(f"NA_MPNN_NODE_TILE={raw!r} is not an integer") from e
    # Must be a positive multiple of 8 (Mosaic sublane granularity); 32 is
    # the largest tile that fits the decoder table kernel's scoped VMEM.
    if t <= 0 or t % 8 or t > 32:
        raise ValueError(
            f"NA_MPNN_NODE_TILE={t} invalid: need a multiple of 8 in [8, 32]")
    if t != 32:
        print(f"[na_mpnn_tpu] non-default NODE_TILE={t} active "
              "(all processes of a multi-host run must agree)", flush=True)
    return t


NODE_TILE = _node_tile_from_env()


def _gelu_grad(x):
    """d/dx gelu(x) = Phi(x) + x * phi(x), with the A&S erf approximation
    (Mosaic has no erf)."""
    from .fused_layers import _erf
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf(xf * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * xf * xf) * 0.3989422804014327
    return cdf + xf * pdf


def _compute_x(h_V, e_in, G, wa_ref, wb_ref, b1_ref, K, compute_dtype,
               contract_e):
    a_i = _dotp(h_V, wa_ref[:], compute_dtype)
    a_edges = _rep_rows(a_i, K)
    x = a_edges + G + b1_ref[:]
    if contract_e:
        x = x + _dotp(e_in, wb_ref[:], compute_dtype)
    else:
        x = x + e_in
    return x


def _fwd_kernel(h_V_ref, e_in_ref, G_ref, mask_att_ref, wa_ref, wb_ref,
                b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref, *, K,
                compute_dtype, contract_e, aggregate):
    x = _compute_x(h_V_ref[:], e_in_ref[:], G_ref[:], wa_ref, wb_ref, b1_ref,
                   K, compute_dtype, contract_e)
    m = _dotp(_gelu(x), w2_ref[:], compute_dtype) + b2_ref[:]
    m = _dotp(_gelu(m), w3_ref[:], compute_dtype) + b3_ref[:]
    if aggregate:
        m = m * mask_att_ref[:]
        out_ref[:] = (_seg_sum(m, K) / MESSAGE_SCALE).astype(out_ref.dtype)
    else:
        out_ref[:] = m.astype(out_ref.dtype)


def _bwd_kernel(h_V_ref, e_in_ref, G_ref, mask_att_ref, wa_ref, wb_ref,
                b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, g_ref,
                g_hV_ref, g_ein_ref, g_G_ref, dwa_ref, dwb_ref, db1_ref,
                dw2_ref, db2_ref, dw3_ref, db3_ref, *, K, compute_dtype,
                contract_e, aggregate):
    h_V = h_V_ref[:]
    e_in = e_in_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dwa_ref, dwb_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
                  db3_ref):
            r[:] = jnp.zeros_like(r)

    # Recompute the tile's activations (remat).
    x = _compute_x(h_V, e_in, G_ref[:], wa_ref, wb_ref, b1_ref, K,
                   compute_dtype, contract_e)
    u1 = _gelu(x)
    y = _dotp(u1, w2_ref[:], compute_dtype) + b2_ref[:]
    u2 = _gelu(y)

    # Cotangent of the per-edge message m.
    if aggregate:
        g_m = _rep_rows(g_ref[:].astype(jnp.float32), K)
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

    s = _seg_sum(g_x, K)                                   # [T, H]
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
# Table-gather variants: the neighbor term is gathered INSIDE the kernel from
# a VMEM-resident per-structure node table (L rows x C cols), via an exact
# 0/1 one-hot matmul built from E_idx. Each output element selects exactly
# one table row, so even a single-pass bf16 dot is exact. This removes the
# [B,L,K,C] pre-gathered tensors (and their HBM round-trips + XLA gather
# dispatches) from every layer. Requires L % NODE_TILE == 0 so a node tile
# never straddles two structures (callers fall back to the pre-gather path
# otherwise — bucketed training shapes always qualify).
# ---------------------------------------------------------------------------


def _onehot_rows(eidx, L, transpose=False, dtype=jnp.float32):
    """0/1 selection matrix from per-edge neighbor indices eidx [T*K, 1]:
    [T*K, L] (or its transpose) with row k one-hot at column eidx[k].
    Built directly in the matmul dtype (0/1 are exact in any float)."""
    TK = eidx.shape[0]
    if transpose:
        rows = jax.lax.broadcasted_iota(jnp.int32, (L, TK), 0)
        return (rows == eidx[:, 0][None, :]).astype(dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TK, L), 1)
    return (cols == eidx).astype(dtype)


def _sel(onehot, table, compute_dtype):
    # Exact selection even at bf16: one nonzero product per output element.
    return jnp.dot(onehot, table.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


def _fwd_kernel_table(h_V_ref, e_in_ref, table_ref, eidx_ref, mask_att_ref,
                      mbw_ref, wa_ref, wb_ref, b1_ref, w2_ref,
                      b2_ref, w3_ref, b3_ref, *refs, K, compute_dtype,
                      dec_mode, aggregate, save_x):
    """Fused message MLP with the in-kernel neighbor gather.

    enc mode (dec_mode=False): x = rep@(h_V@wa) + e_in@wb + sel(table) + b1
    dec mode: the table has 2H cols [A | B] with A = h_S@ws + h_Vcur@wv -
    h_Venc@wv and B = h_Venc@wv (the 3-term context collapsed via the exact
    identity mask_fw = mask_1d - mask_bw, models.mpnn.autoregressive_edge_
    masks); x = rep@(h_V@wa) + m1d*(e_in@wb) + mbw*selA + m1d*selB + b1,
    where m1d rides mask_att_ref.

    save_x=True additionally writes the pre-GELU activations x so the
    backward kernel skips the (dominant) gather-matmul recompute."""
    if save_x:
        out_ref, x_ref = refs
    else:
        (out_ref,) = refs
    H = h_V_ref.shape[1]
    L = table_ref.shape[0]

    a_i = _dotp(h_V_ref[:], wa_ref[:], compute_dtype)
    x = _rep_rows(a_i, K) + b1_ref[:]
    onehot = _onehot_rows(eidx_ref[:], L, dtype=compute_dtype)
    g = _sel(onehot, table_ref[:], compute_dtype)
    if dec_mode:
        ctx = mbw_ref[:] * g[:, :H] + mask_att_ref[:] * g[:, H:]
        x = x + ctx + mask_att_ref[:] * _dotp(e_in_ref[:], wb_ref[:],
                                              compute_dtype)
    else:
        x = x + g + _dotp(e_in_ref[:], wb_ref[:], compute_dtype)
    if save_x:
        x_ref[:] = x.astype(x_ref.dtype)

    m = _dotp(_gelu(x), w2_ref[:], compute_dtype) + b2_ref[:]
    m = _dotp(_gelu(m), w3_ref[:], compute_dtype) + b3_ref[:]
    if aggregate:
        if not dec_mode:
            m = m * mask_att_ref[:]
        out_ref[:] = (_seg_sum(m, K) / MESSAGE_SCALE).astype(out_ref.dtype)
    else:
        out_ref[:] = m.astype(out_ref.dtype)


def _bwd_kernel_table(h_V_ref, e_in_ref, x_ref, eidx_ref, mask_att_ref,
                      mbw_ref, wa_ref, wb_ref, b1_ref, w2_ref,
                      b2_ref, w3_ref, b3_ref, g_ref,
                      g_hV_ref, g_ein_ref, g_tab_ref, dwa_ref, dwb_ref,
                      db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref, *, K,
                      compute_dtype, dec_mode, aggregate, L):
    """Backward from the SAVED pre-GELU activations x (no gather recompute;
    the table values are not needed at all — only the scatter of the table
    cotangent, an eidx-driven one-hot-transpose matmul)."""
    T = h_V_ref.shape[0]
    h_V = h_V_ref[:]
    e_in = e_in_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dwa_ref, dwb_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
                  db3_ref):
            r[:] = jnp.zeros_like(r)

    # The table-grad block accumulates across the tiles of one structure;
    # zero it when a new structure's block is first mapped in.
    @pl.when((pl.program_id(0) * T) % L == 0)
    def _():
        g_tab_ref[:] = jnp.zeros_like(g_tab_ref)

    # Resume the forward from the saved activations.
    x = x_ref[:].astype(jnp.float32)
    u1 = _gelu(x)
    y = _dotp(u1, w2_ref[:], compute_dtype) + b2_ref[:]
    u2 = _gelu(y)

    if aggregate:
        g_m = _rep_rows(g_ref[:].astype(jnp.float32), K)
        if not dec_mode:
            g_m = g_m * mask_att_ref[:]
        g_m = g_m / MESSAGE_SCALE
    else:
        g_m = g_ref[:].astype(jnp.float32)

    def dotT_acc(a, b):
        return jax.lax.dot_general(
            a.astype(compute_dtype), b.astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(compute_dtype))

    def dotB(a, w):
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

    onehotT = _onehot_rows(eidx_ref[:], L, transpose=True,
                           dtype=compute_dtype)
    if dec_mode:
        g_e_contrib = mask_att_ref[:] * g_x
        g_tab = jnp.concatenate(
            [mbw_ref[:] * g_x, mask_att_ref[:] * g_x], axis=1)
    else:
        g_e_contrib = g_x
        g_tab = g_x
    g_tab_ref[:] += _sel(onehotT, g_tab, compute_dtype)
    g_ein_ref[:] = dotB(g_e_contrib, wb_ref[:]).astype(g_ein_ref.dtype)
    dwb_ref[:] += dotT_acc(e_in, g_e_contrib)

    s = _seg_sum(g_x, K)
    g_hV_ref[:] = dotB(s, wa_ref[:]).astype(g_hV_ref.dtype)
    dwa_ref[:] += dotT_acc(h_V, s)


def _table_specs(T, K, H, L, C_tab, aggregate, for_bwd, save_x=False):
    node = pl.BlockSpec((T, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    edge = pl.BlockSpec((T * K, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    edge1 = pl.BlockSpec((T * K, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table = pl.BlockSpec((L, C_tab), lambda i: ((i * T) // L, 0),
                         memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    if for_bwd:
        # x rides the table slot (the bwd kernel needs no table values).
        in_specs = [node, edge, edge, edge1, edge1, edge1,
                    mat, mat, row, mat, row, mat, row]
        in_specs = in_specs + [node if aggregate else edge]
        out_specs = [node, edge, table, mat, mat, row, mat, row, mat, row]
        return in_specs, out_specs
    in_specs = [node, edge, table, edge1, edge1, edge1,
                mat, mat, row, mat, row, mat, row]
    out_spec = node if aggregate else edge
    if save_x:
        return in_specs, [out_spec, edge]
    return in_specs, out_spec


@functools.partial(jax.jit, static_argnames=("K", "L", "compute_dtype",
                                             "dec_mode", "aggregate",
                                             "interpret", "save_x"))
def _message_table_fwd_call(h_V, e_in, table, eidx, mask_att, mbw,
                            wa, wb, b1, w2, b2, w3, b3,
                            K, L, compute_dtype, dec_mode, aggregate,
                            interpret, save_x=False):
    N, H = h_V.shape
    T = NODE_TILE
    assert N % T == 0 and L % T == 0 and N % L == 0, (N, T, L)
    C_tab = table.shape[1]
    assert C_tab == (2 * H if dec_mode else H), (C_tab, H, dec_mode)
    in_specs, out_spec = _table_specs(T, K, H, L, C_tab, aggregate,
                                      for_bwd=False, save_x=save_x)
    kernel = functools.partial(_fwd_kernel_table, K=K,
                               compute_dtype=compute_dtype,
                               dec_mode=dec_mode, aggregate=aggregate,
                               save_x=save_x)
    out_shape = jax.ShapeDtypeStruct((N, H) if aggregate else (N * K, H),
                                     h_V.dtype)
    if save_x:
        out_shape = [out_shape, jax.ShapeDtypeStruct((N * K, H), h_V.dtype)]
    return pl.pallas_call(
        kernel, grid=(N // T,), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * H * (3 * H + C_tab * L // H),
            bytes_accessed=(N * K * H * (3 if save_x else 2)
                            + N * H * 2) * 4,
            transcendentals=N * K * H * 2,
        ),
        interpret=interpret,
    )(h_V, e_in, table, eidx, mask_att, mbw, wa, wb, b1, w2, b2, w3, b3)


@functools.partial(jax.jit, static_argnames=("K", "L", "C_tab",
                                             "compute_dtype",
                                             "dec_mode", "aggregate",
                                             "interpret"))
def _message_table_bwd_call(h_V, e_in, x, eidx, mask_att, mbw,
                            wa, wb, b1, w2, b2, w3, b3, g,
                            K, L, C_tab, compute_dtype, dec_mode, aggregate,
                            interpret):
    N, H = h_V.shape
    T = NODE_TILE
    in_specs, out_specs = _table_specs(T, K, H, L, C_tab, aggregate,
                                       for_bwd=True)
    kernel = functools.partial(_bwd_kernel_table, K=K,
                               compute_dtype=compute_dtype,
                               dec_mode=dec_mode, aggregate=aggregate, L=L)
    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((N, H), h_V.dtype),       # g_hV
        jax.ShapeDtypeStruct((N * K, H), e_in.dtype),  # g_ein
        jax.ShapeDtypeStruct((N, C_tab), f32),         # g_table
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
            flops=2 * N * K * H * (5 * H + C_tab * L // H),
            bytes_accessed=(N * K * H * 5 + N * H * 4) * 4,
            transcendentals=N * K * H * 4,
        ),
        interpret=interpret,
    )(h_V, e_in, x, eidx, mask_att, mbw, wa, wb, b1, w2, b2, w3, b3, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18))
def message_mlp_table(h_V, e_in, table, eidx, mask_att, mbw,
                      wa, wb, b1, w2, b2, w3, b3,
                      K, L, compute_dtype, dec_mode, aggregate, interpret):
    """Fused message MLP with in-kernel neighbor gather (see module notes).
    eidx/mask_att/mbw are structural (zero cotangents); table/e_in/h_V
    and all weights are differentiable. Under differentiation the forward
    additionally saves the pre-GELU activations x (an [N*K, H] trunk-dtype
    tensor) so the backward kernel resumes from x instead of re-running the
    gather — the HBM round-trip for x is ~10x cheaper than the one-hot
    gather matmul recompute at training shapes."""
    return _message_table_fwd_call(h_V, e_in, table, eidx, mask_att, mbw,
                                   wa, wb, b1, w2, b2, w3, b3,
                                   K, L, compute_dtype, dec_mode, aggregate,
                                   interpret, save_x=False)


def _message_mlp_table_fwd(h_V, e_in, table, eidx, mask_att, mbw,
                           wa, wb, b1, w2, b2, w3, b3,
                           K, L, compute_dtype, dec_mode, aggregate,
                           interpret):
    from jax.ad_checkpoint import checkpoint_name
    out, x = _message_table_fwd_call(h_V, e_in, table, eidx, mask_att, mbw,
                                     wa, wb, b1, w2, b2, w3, b3,
                                     K, L, compute_dtype, dec_mode, aggregate,
                                     interpret, save_x=True)
    # Under the layer-level jax.checkpoint policy (save_only msg_kernel_out)
    # x must be SAVED, not recomputed — recomputing it would re-run this
    # forward kernel in the backward pass, defeating the point.
    x = checkpoint_name(x, "msg_kernel_out")
    return out, (h_V, e_in, x, eidx, mask_att, mbw,
                 wa, wb, b1, w2, b2, w3, b3)


def _message_mlp_table_bwd(K, L, compute_dtype, dec_mode, aggregate,
                           interpret, res, g):
    (h_V, e_in, x, eidx, mask_att, mbw,
     wa, wb, b1, w2, b2, w3, b3) = res
    H = h_V.shape[1]
    C_tab = 2 * H if dec_mode else H
    (g_hV, g_ein, g_tab, dwa, dwb, db1, dw2, db2, dw3, db3) = \
        _message_table_bwd_call(h_V, e_in, x, eidx, mask_att, mbw,
                                wa, wb, b1, w2, b2, w3, b3, g,
                                K, L, C_tab, compute_dtype, dec_mode,
                                aggregate, interpret)
    return (g_hV, g_ein, g_tab.astype(h_V.dtype), jnp.zeros_like(eidx),
            jnp.zeros_like(mask_att), jnp.zeros_like(mbw),
            dwa.astype(wa.dtype), dwb.astype(wb.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dw3.astype(w3.dtype), db3.astype(b3.dtype))


message_mlp_table.defvjp(_message_mlp_table_fwd, _message_mlp_table_bwd)


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


def table_gather_ok(B, L):
    """In-kernel gather requires node tiles that never straddle structures."""
    return L % NODE_TILE == 0


def _flat_eidx(E_idx):
    B, L, K = E_idx.shape
    return E_idx.astype(jnp.int32).reshape(B * L * K, 1)


def message_agg_table_flat(p, h_V2, h_E2, table2, eidx2, mask_att2, *, K, L,
                           compute_dtype=jnp.float32, w1="W1", w2="W2",
                           w3="W3", interpret=False):
    """Flat-edge encoder node update: h_V2/table2 [N,H], h_E2 [N*K,H],
    eidx2 [N*K,1] int32, mask_att2 [N*K,1]. -> dh [N,H]. Keeping edge
    tensors flat end-to-end avoids the [B,L,K,H]<->[N*K,H] relayouts XLA
    otherwise materializes around every kernel (~3 ms/step profiled)."""
    H = h_V2.shape[1]
    wsplit = p[w1]["w"]
    z1 = jnp.zeros((h_E2.shape[0], 1), h_V2.dtype)
    return message_mlp_table(
        h_V2, h_E2, table2, eidx2, mask_att2.astype(h_V2.dtype), z1,
        wsplit[:H], wsplit[H:2 * H], p[w1]["b"][None, :],
        p[w2]["w"], p[w2]["b"][None, :], p[w3]["w"], p[w3]["b"][None, :],
        K, L, compute_dtype, False, True, interpret)


def message_edge_table_flat(p, h_V2, h_E2, table2, eidx2, *, K, L,
                            compute_dtype=jnp.float32, w1="W11", w2="W12",
                            w3="W13", interpret=False):
    """Flat-edge encoder edge update: -> m [N*K, H]."""
    H = h_V2.shape[1]
    wsplit = p[w1]["w"]
    ones1 = jnp.ones((h_E2.shape[0], 1), h_V2.dtype)
    return message_mlp_table(
        h_V2, h_E2, table2, eidx2, ones1, ones1,
        wsplit[:H], wsplit[H:2 * H], p[w1]["b"][None, :],
        p[w2]["w"], p[w2]["b"][None, :], p[w3]["w"], p[w3]["b"][None, :],
        K, L, compute_dtype, False, False, interpret)


def message_dec_table_flat(p, h_V2, h_E2, table2, eidx2, m1d2, mbw2, *, K, L,
                           compute_dtype=jnp.float32, interpret=False):
    """Flat-edge parallel-decode node update (2H table, see
    message_dec_table_batched): -> dh [N, H]."""
    H = h_V2.shape[1]
    wsplit = p["W1"]["w"]
    return message_mlp_table(
        h_V2, h_E2, table2, eidx2, m1d2.astype(h_V2.dtype),
        mbw2.astype(h_V2.dtype),
        wsplit[:H], wsplit[H:2 * H], p["W1"]["b"][None, :],
        p["W2"]["w"], p["W2"]["b"][None, :], p["W3"]["w"],
        p["W3"]["b"][None, :],
        K, L, compute_dtype, True, True, interpret)


def message_agg_table_batched(p, h_V, h_E, table, E_idx, mask_att, *,
                              compute_dtype=jnp.float32, w1="W1", w2="W2",
                              w3="W3", interpret=False):
    """Encoder node update with the neighbor term gathered in-kernel:
    table [B, L, H] = h_V @ wc (node-level). -> dh [B, L, H]."""
    B, L, K, H = h_E.shape
    N = B * L
    assert table_gather_ok(B, L), (B, L)
    dh = message_agg_table_flat(
        p, _flat_nodes(h_V, N), _flat_edges(h_E, N), table.reshape(N, H),
        _flat_eidx(E_idx),
        _flat_edges(mask_att[..., None], N).astype(h_V.dtype),
        K=K, L=L, compute_dtype=compute_dtype, w1=w1, w2=w2, w3=w3,
        interpret=interpret)
    return dh.reshape(B, L, H)


def message_edge_table_batched(p, h_V, h_E, table, E_idx, *,
                               compute_dtype=jnp.float32, w1="W11", w2="W12",
                               w3="W13", interpret=False):
    """Encoder edge update with in-kernel gather: -> m [B,L,K,H]."""
    B, L, K, H = h_E.shape
    N = B * L
    assert table_gather_ok(B, L), (B, L)
    m = message_edge_table_flat(
        p, _flat_nodes(h_V, N), _flat_edges(h_E, N), table.reshape(N, H),
        _flat_eidx(E_idx), K=K, L=L, compute_dtype=compute_dtype,
        w1=w1, w2=w2, w3=w3, interpret=interpret)
    return m[:N * K].reshape(B, L, K, H)


def message_dec_table_batched(p, h_V, h_E, table2, E_idx, mask, mask_bw,
                              *, compute_dtype=jnp.float32,
                              interpret=False):
    """Parallel-decode node update with the neighbor context gathered
    in-kernel from a 2H table [A | B], A = h_S@ws + h_Vcur@wv - h_Venc@wv,
    B = h_Venc@wv:
      ctx = mask_bw*selA + mask_1d*selB
          = mask_bw*(sel(h_S@ws) + sel(h_Vcur@wv)) + mask_fw*sel(h_Venc@wv)
    exactly, because mask_fw = mask_1d - mask_bw (models.mpnn.
    autoregressive_edge_masks; reference semantics na_model_utils.py:632-639).
    One H-column narrower than the naive 3H table => 1/3 fewer gather-matmul
    flops. -> dh [B, L, H]."""
    B, L, K, H = h_E.shape
    N = B * L
    assert table_gather_ok(B, L), (B, L)

    def edge1(x):  # [B,L,K] -> [N*K, 1]
        return x.reshape(N * K, 1).astype(h_V.dtype)

    m1d = jnp.broadcast_to(mask[:, :, None], (B, L, K))
    dh = message_dec_table_flat(
        p, _flat_nodes(h_V, N), _flat_edges(h_E, N), table2.reshape(N, 2 * H),
        _flat_eidx(E_idx), edge1(m1d), edge1(mask_bw[..., 0]),
        K=K, L=L, compute_dtype=compute_dtype, interpret=interpret)
    return dh.reshape(B, L, H)
