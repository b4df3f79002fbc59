"""Masked exact k-nearest-neighbor selection (Pallas TPU kernel).

Replaces ``jax.lax.top_k`` over the [B,L,L] masked distance matrix (reference
ProteinFeatures._dist, na_model_utils.py:413-421), which lowers to a full
variadic sort on TPU. Here each grid step owns a [Q, L] tile of the distance
matrix, computes the masked distances in VMEM, and runs K successive
min/argmin sweeps (K=32 << L, so K linear sweeps beat an O(L log L) sort and
never touch HBM with the distance matrix).

Semantics match the reference exactly: invalid pairs get the row max added,
ties resolve to the lowest column index, and outputs are sorted ascending —
the same contract as lax.top_k(-D) and torch.topk(largest=False).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_TILE = 256


def _kernel(xq_ref, xk_ref, mq_ref, mk_ref, val_ref, idx_ref, *, k, eps):
    xq = xq_ref[0]            # [Q, 3]
    xk = xk_ref[0]            # [3, L]
    Q = xq.shape[0]
    L = xk.shape[1]

    D2 = jnp.full((Q, L), eps, jnp.float32)
    for c in range(3):
        d = xq[:, c:c + 1] - xk[c:c + 1, :]
        D2 = D2 + d * d
    mask2d = mq_ref[0][:, 0:1] * mk_ref[0][0:1, :]
    D = mask2d * jnp.sqrt(D2)
    D_max = jnp.max(D, axis=1, keepdims=True)
    D = D + (1.0 - mask2d) * D_max

    col = jax.lax.broadcasted_iota(jnp.int32, (Q, L), 1)
    vals, idxs = [], []
    for _ in range(k):
        mv = jnp.min(D, axis=1, keepdims=True)
        mi = jnp.min(jnp.where(D == mv, col, L), axis=1, keepdims=True)
        vals.append(mv)
        idxs.append(mi)
        D = jnp.where(col == mi, jnp.inf, D)
    val_ref[0] = jnp.concatenate(vals, axis=1)
    idx_ref[0] = jnp.concatenate(idxs, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_graph_pallas_qk(X_q, X_k, mask_q, mask_k, k=32, eps=1e-6,
                        interpret=False):
    """Query/key variant: X_q [B,Lq,3] query rows vs X_k [B,Lk,3] keys ->
    (D_neighbors [B,Lq,k], E_idx [B,Lq,k] of key indices). Used by the
    edge-partitioned forward (local queries, global keys); identical row
    semantics to knn_graph_pallas."""
    B, Lq_orig, _ = X_q.shape
    Lk = X_k.shape[1]
    k = min(k, Lk)

    Lq = Lq_orig if Lq_orig <= QUERY_TILE else _round_up(Lq_orig, QUERY_TILE)
    if Lq != Lq_orig:
        X_q = jnp.pad(X_q, ((0, 0), (0, Lq - Lq_orig), (0, 0)))
        mask_q = jnp.pad(mask_q, ((0, 0), (0, Lq - Lq_orig)))
    Q = min(QUERY_TILE, Lq)

    Xq = X_q.astype(jnp.float32)
    Xk = jnp.swapaxes(X_k.astype(jnp.float32), 1, 2)   # [B,3,Lk]
    mq = mask_q.astype(jnp.float32)[..., None]
    mk = mask_k.astype(jnp.float32)[:, None, :]

    grid = (B, Lq // Q)
    kernel = functools.partial(_kernel, k=k, eps=eps)
    D_neighbors, E_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q, 3), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Lk), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, 1), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, k), jnp.float32),
            jax.ShapeDtypeStruct((B, Lq, k), jnp.int32),
        ],
        interpret=interpret,
    )(Xq, Xk, mq, mk)
    return D_neighbors[:, :Lq_orig], E_idx[:, :Lq_orig]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_graph_pallas(X_ref, mask, k=32, eps=1e-6, interpret=False):
    """Masked kNN: X_ref [B,L,3] reference coords, mask [B,L] ->
    (D_neighbors [B,L,k] ascending, E_idx [B,L,k] int32).

    Matches features.knn_graph / the reference _dist+topk semantics exactly
    (including tie resolution toward lower index).
    """
    B, L_orig, _ = X_ref.shape
    k = min(k, L_orig)
    assert L_orig >= k, (L_orig, k)

    # Pad L to the query tile. Padded keys carry mask 0, so their adjusted
    # distance equals the row max; index-tie resolution always prefers the
    # (lower-index) real columns, so padded keys are never selected while a
    # row has >= k real columns — guaranteed by L_orig >= k.
    L = L_orig if L_orig <= QUERY_TILE else _round_up(L_orig, QUERY_TILE)
    if L != L_orig:
        X_ref = jnp.pad(X_ref, ((0, 0), (0, L - L_orig), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, L - L_orig)))
    Q = min(QUERY_TILE, L)

    Xq = X_ref.astype(jnp.float32)                     # [B,L,3] query rows
    Xk = jnp.swapaxes(Xq, 1, 2)                        # [B,3,L] key planes
    mq = mask.astype(jnp.float32)[..., None]           # [B,L,1]
    mk = mask.astype(jnp.float32)[:, None, :]          # [B,1,L]

    grid = (B, L // Q)
    kernel = functools.partial(_kernel, k=k, eps=eps)
    D_neighbors, E_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q, 3), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, L), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, 1), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, k), jnp.float32),
            jax.ShapeDtypeStruct((B, L, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * L * L * (8 + 4 * k),
            bytes_accessed=B * L * (3 + 1 + 2 * k) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Xq, Xk, mq, mk)
    return D_neighbors[:, :L_orig], E_idx[:, :L_orig]


def _round_up(x, m):
    return (x + m - 1) // m * m
