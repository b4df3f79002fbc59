"""Polymer-class-specialized fused RBF featurizer (Pallas TPU kernel).

The all-pair-atom RBF edge features (reference na_model_utils.py:433-443)
nominally span 18x18 atom pairs x 16 bins = 5184 dims per edge, but each
residue populates only its own polymer class's atoms: protein rows carry 5 of
the 18 atom slots (N, CA, C, O, virtual Cb) and nucleic rows carry 13
(11-12 backbone + virtual base-N).  Every atom pair whose endpoints straddle
an unpopulated slot is masked to zero before the projection, so the dense
18x18 computation wastes 75-92% of its FLOPs and transcendentals.

This kernel partitions the 18 atom slots into the protein block P (5) and the
nucleic block N (13), giving four specialized atom-pair blocks:

    0: P-query x P-neighbor   ->  5x5x16  =  400-dim block
    1: P x N                  ->  5x13x16 = 1040
    2: N x P                  -> 1040
    3: N x N                  -> 13x13x16 = 2704
    4: fallback (mixed)       -> all four blocks summed (== dense, exactly)

Specialization is *opportunistic per tile*: edges stay in their natural
(query-major) order, and a tile of EDGE_TILE consecutive edges runs a
specialized branch iff every edge in it has the same endpoint class pair —
else it takes the dense fallback. The classification happens *inside the
kernel* from the atom-mask operands already resident in VMEM (two tiny 0/1
matmuls + a min/max reduce), so the host-side call is byte-identical to the
dense kernel's: no sort, no permutation, no extra XLA ops. (Two earlier
designs — globally sorting edges by group, and computing per-tile group ids
in XLA with scalar prefetch — both spent more wall-clock on their unfusable
index ops than the specialization saved.) Because chains are contiguous and
the K neighbors of a residue are spatially local, the vast majority of tiles
are pure: only class-interface tiles pay the dense fallback. Pure tiles cost
their block's rows instead of 5184 — a ~4x FLOP cut on a 50/50 protein/NA
batch, up to ~13x on pure-protein regions — with *exactly* the dense
semantics (the four blocks partition the 18x18 pair grid, and the atom masks
already zero the dropped pairs in the dense formulation).

Differentiable w.r.t. the projection weights only (coordinates and masks are
structural data with zero cotangents, matching ops.rbf_edge).

Negative result (measured, do not re-attempt): building the per-edge
coordinate/mask operands *inside* the kernel from VMEM-resident node tables
via one-hot selection matmuls (the design that wins in ops.message_kernels)
LOSES here — 10.1 ms vs 6.1 ms for the dense-operand path at B=8, L=768,
K=32, same process, interleaved (A/B harness + table kernel live at git
history commit 02e0417; removed once the result was in). The selected
operand is only 4A=72+18 columns wide, so the [TILE, L] @ [L, 4A] selection
matmuls (~27 GFLOP/fwd, fp32-HIGHEST because the table holds raw
coordinates) cost far more than the ~70 MB HBM gather they replace. The
message kernels win the same trade because their tables are H/3H columns
wide, already bf16, and each tile's message MLP dwarfs the selection.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.features import RBF_D_MAX, RBF_D_MIN

A = 18
NUM_RBF = 16
EDGE_TILE = 256

# Atom-slot partition of the 18-atom augmented frame (constants.BACKBONE_ATOMS
# + virtual Cb at 16 + virtual base-N at 17).
P_SEL = (0, 1, 2, 3, 16)                                  # N, CA, C, O, vCb
N_SEL = (4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 17)    # NA backbone + vN
GROUP_SELS = [(P_SEL, P_SEL), (P_SEL, N_SEL), (N_SEL, P_SEL), (N_SEL, N_SEL)]
NUM_GROUPS = 5  # 4 specialized + fallback


def group_rows(num_rbf=NUM_RBF):
    """Row indices (into the reference [A*A*R, H] weight) for each group's
    table, in kernel order r*(Aq*An) + qpos*An + npos."""
    rows = []
    for selq, seln in GROUP_SELS:
        Aq, An = len(selq), len(seln)
        r, q, n = np.meshgrid(np.arange(num_rbf), np.arange(Aq), np.arange(An),
                              indexing="ij")
        a = np.asarray(selq)[q]
        b = np.asarray(seln)[n]
        rows.append(((a * A + b) * num_rbf + r).reshape(-1))
    return rows


def split_weight_tables(W, num_rbf=NUM_RBF):
    """Reference-order [A*A*R, H] weight -> 4 kernel-order group tables."""
    W = jnp.asarray(W)
    return [jnp.take(W, jnp.asarray(r), axis=0) for r in group_rows(num_rbf)]


def _expansion(selq, seln):
    """0/1 expansion matrices EA/EB [A, Aq*An] built from iota: EA maps the
    per-atom [T,A] arrays onto the (query, neighbor) pair grid."""
    Aq, An = len(selq), len(seln)
    AA = Aq * An
    row = jax.lax.broadcasted_iota(jnp.int32, (A, AA), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (A, AA), 1)
    colq = col // An
    coln = col % An
    EA = jnp.zeros((A, AA), jnp.float32)
    EB = jnp.zeros((A, AA), jnp.float32)
    for s, a in enumerate(selq):
        EA = EA + ((row == a) & (colq == s)).astype(jnp.float32)
    for s, b in enumerate(seln):
        EB = EB + ((row == b) & (coln == s)).astype(jnp.float32)
    return EA, EB


def _expand(v, E):
    # HIGHEST precision: 0/1 gather-pattern matmul on raw coordinates.
    return jnp.dot(v, E, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _rbf_block(xi, xj, mi, mj, selq, seln, num_rbf, compute_dtype):
    """Masked RBF bins for one atom-pair block: [T, R*Aq*An]."""
    EA, EB = _expansion(selq, seln)
    AA = EA.shape[1]
    D2 = jnp.full((xi.shape[0], AA), 1e-6, jnp.float32)
    for c in range(3):
        d = _expand(xi[:, c * A:(c + 1) * A], EA) - _expand(xj[:, c * A:(c + 1) * A], EB)
        D2 = D2 + d * d
    D = jnp.sqrt(D2)
    mask = _expand(mi, EA) * _expand(mj, EB)
    sigma = (RBF_D_MAX - RBF_D_MIN) / num_rbf
    blocks = []
    for r in range(num_rbf):
        mu_r = RBF_D_MIN + r * (RBF_D_MAX - RBF_D_MIN) / (num_rbf - 1)
        z = (D - mu_r) * (1.0 / sigma)
        blocks.append(jnp.exp(-z * z) * mask)
    return jnp.concatenate(blocks, axis=1).astype(compute_dtype)


def _proj_precision(compute_dtype):
    return (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _tile_gid(mi, mj):
    """In-kernel tile classification from the atom masks: per-edge endpoint
    side codes (0 = P-block only/empty, 1 = N-block only, 2 = mixed), then
    the tile is (g_lo, pure) where pure means every edge shares group g_lo.

    Group encoding: 0=PP 1=PN 2=NP 3=NN, 4=mixed-side."""
    p_ind = jnp.zeros((A, 1), jnp.float32)
    n_ind = jnp.zeros((A, 1), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
    for a in P_SEL:
        p_ind = p_ind + (row == a).astype(jnp.float32)
    for a in N_SEL:
        n_ind = n_ind + (row == a).astype(jnp.float32)

    def side_code(m):
        has_p = (jnp.dot(m, p_ind, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) > 0)
        has_n = (jnp.dot(m, n_ind, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) > 0)
        return (has_n.astype(jnp.int32)
                + (has_n & has_p).astype(jnp.int32))          # [T, 1]

    cq = side_code(mi)
    cn = side_code(mj)
    gid = jnp.where((cq < 2) & (cn < 2), 2 * cq + cn, 4)      # [T, 1]
    g_lo = jnp.min(gid)
    g_hi = jnp.max(gid)
    return g_lo, (g_lo == g_hi) & (g_lo < 4)


def _fwd_kernel(xi_ref, xj_ref, mi_ref, mj_ref, w0_ref, w1_ref,
                w2_ref, w3_ref, out_ref, *, num_rbf, compute_dtype):
    xi, xj, mi, mj = xi_ref[:], xj_ref[:], mi_ref[:], mj_ref[:]
    w_refs = [w0_ref, w1_ref, w2_ref, w3_ref]
    precision = _proj_precision(compute_dtype)
    g_lo, pure = _tile_gid(mi, mj)

    def block(g):
        selq, seln = GROUP_SELS[g]
        R = _rbf_block(xi, xj, mi, mj, selq, seln, num_rbf, compute_dtype)
        return jnp.dot(R, w_refs[g][:].astype(compute_dtype),
                       preferred_element_type=jnp.float32, precision=precision)

    for g in range(4):
        @pl.when(pure & (g_lo == g))
        def _(g=g):
            out_ref[:] = block(g)

    @pl.when(jnp.logical_not(pure))
    def _():
        # Mixed tile: the four blocks partition the full 18x18 pair grid,
        # so their sum is the dense result exactly.
        out_ref[:] = block(0) + block(1) + block(2) + block(3)


def _bwd_kernel(xi_ref, xj_ref, mi_ref, mj_ref, g_ref, dw0_ref,
                dw1_ref, dw2_ref, dw3_ref, *, num_rbf, compute_dtype):
    xi, xj, mi, mj = xi_ref[:], xj_ref[:], mi_ref[:], mj_ref[:]
    dw_refs = [dw0_ref, dw1_ref, dw2_ref, dw3_ref]
    precision = _proj_precision(compute_dtype)
    g_lo, pure = _tile_gid(mi, mj)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for dw in dw_refs:
            dw[:] = jnp.zeros_like(dw)

    def accum(g):
        selq, seln = GROUP_SELS[g]
        R = _rbf_block(xi, xj, mi, mj, selq, seln, num_rbf, compute_dtype)
        dw_refs[g][:] += jax.lax.dot_general(
            R, g_ref[:].astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    for g in range(4):
        @pl.when(pure & (g_lo == g))
        def _(g=g):
            accum(g)

    @pl.when(jnp.logical_not(pure))
    def _():
        for g in range(4):
            accum(g)


def _table_sizes(num_rbf):
    return [num_rbf * len(sq) * len(sn) for sq, sn in GROUP_SELS]


@functools.partial(jax.jit, static_argnames=("num_rbf", "compute_dtype",
                                             "interpret"))
def _classed_fwd(Xi, Xj, Mi, Mj, W0, W1, W2, W3, num_rbf=NUM_RBF,
                 compute_dtype=jnp.float32, interpret=False):
    C = Xi.shape[0]
    H = W0.shape[1]
    assert C % EDGE_TILE == 0, C
    sizes = _table_sizes(num_rbf)
    kernel = functools.partial(_fwd_kernel, num_rbf=num_rbf,
                               compute_dtype=compute_dtype)
    edge = lambda c: pl.BlockSpec((EDGE_TILE, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    # Average useful FLOPs (assumes ~even group mix; used only for scheduling).
    flops = 2 * C * (sum(sizes) // 2) * H
    return pl.pallas_call(
        kernel, grid=(C // EDGE_TILE,),
        in_specs=[edge(3 * A), edge(3 * A), edge(A), edge(A)]
        + [pl.BlockSpec((s, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
           for s in sizes],
        out_specs=edge(H),
        out_shape=jax.ShapeDtypeStruct((C, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=C * (2 * 3 * A + 2 * A + H) * 4,
            transcendentals=C * sum(sizes) // 2,
        ),
        interpret=interpret,
    )(Xi, Xj, Mi, Mj, W0, W1, W2, W3)


@functools.partial(jax.jit, static_argnames=("num_rbf", "compute_dtype",
                                             "interpret"))
def _classed_dw(Xi, Xj, Mi, Mj, g, num_rbf=NUM_RBF,
                compute_dtype=jnp.float32, interpret=False):
    C = Xi.shape[0]
    H = g.shape[1]
    assert C % EDGE_TILE == 0, C
    sizes = _table_sizes(num_rbf)
    kernel = functools.partial(_bwd_kernel, num_rbf=num_rbf,
                               compute_dtype=compute_dtype)
    edge = lambda c: pl.BlockSpec((EDGE_TILE, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(C // EDGE_TILE,),
        in_specs=[edge(3 * A), edge(3 * A), edge(A), edge(A), edge(H)],
        out_specs=[pl.BlockSpec((s, H), lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for s in sizes],
        out_shape=[jax.ShapeDtypeStruct((s, H), jnp.float32) for s in sizes],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * (sum(sizes) // 2) * H,
            bytes_accessed=C * (2 * 3 * A + 2 * A + H) * 4,
            transcendentals=C * sum(sizes) // 2,
        ),
        interpret=interpret,
    )(Xi, Xj, Mi, Mj, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _classed_proj(Xi, Xj, Mi, Mj, W0, W1, W2, W3, compute_dtype, interpret):
    return _classed_fwd(Xi, Xj, Mi, Mj, W0, W1, W2, W3,
                        compute_dtype=compute_dtype, interpret=interpret)


def _classed_proj_fwd(Xi, Xj, Mi, Mj, W0, W1, W2, W3, compute_dtype,
                      interpret):
    out = _classed_proj(Xi, Xj, Mi, Mj, W0, W1, W2, W3, compute_dtype,
                        interpret)
    return out, (Xi, Xj, Mi, Mj)


def _classed_proj_bwd(compute_dtype, interpret, res, g):
    Xi, Xj, Mi, Mj = res
    dws = _classed_dw(Xi, Xj, Mi, Mj, g.astype(jnp.float32),
                      compute_dtype=compute_dtype, interpret=interpret)
    zeros = (jnp.zeros_like(Xi), jnp.zeros_like(Xj),
             jnp.zeros_like(Mi), jnp.zeros_like(Mj))
    return zeros + tuple(dws)


_classed_proj.defvjp(_classed_proj_fwd, _classed_proj_bwd)


def _round_up(x, m):
    return (x + m - 1) // m * m


def rbf_edge_features_classed_qk(X_aug_q, X_m_q, X_aug_k, X_m_k, E_idx, W,
                                 compute_dtype=jnp.float32, interpret=False):
    """Query/key variant for the edge-partitioned forward: local query rows
    [B,Lq,A,3] against globally-gathered neighbor rows ([B,Lk,A,3] indexed by
    E_idx [B,Lq,K]). Same kernel, same exact semantics."""
    B, Lq, A_, _ = X_aug_q.shape
    K = E_idx.shape[2]
    assert A_ == A, (A_, A)
    E = B * Lq * K
    Ep = _round_up(E, EDGE_TILE)

    Xq_planes = jnp.concatenate(
        [X_aug_q[..., c].astype(jnp.float32) for c in range(3)], axis=-1)
    Xk_planes = jnp.concatenate(
        [X_aug_k[..., c].astype(jnp.float32) for c in range(3)], axis=-1)
    idx = E_idx.reshape(B, Lq * K)
    Xj = jnp.take_along_axis(Xk_planes, idx[..., None], axis=1)
    Mj = jnp.take_along_axis(X_m_k.astype(jnp.float32), idx[..., None], axis=1)
    Xi = jnp.repeat(Xq_planes, K, axis=1)
    Mi = jnp.repeat(X_m_q.astype(jnp.float32), K, axis=1)

    def _pad(x):
        x = x.reshape(E, x.shape[-1])
        return jnp.pad(x, ((0, Ep - E), (0, 0))) if Ep != E else x

    W0, W1, W2, W3 = split_weight_tables(W)
    sg = jax.lax.stop_gradient
    out = _classed_proj(
        sg(_pad(Xi)), sg(_pad(Xj)), sg(_pad(Mi)), sg(_pad(Mj)),
        W0.astype(jnp.float32), W1.astype(jnp.float32),
        W2.astype(jnp.float32), W3.astype(jnp.float32), compute_dtype,
        interpret)
    return out[:E].reshape(B, Lq, K, -1)


def rbf_edge_features_classed(X_aug, X_m_aug, E_idx, W,
                              compute_dtype=jnp.float32, interpret=False):
    """Drop-in replacement for ops.rbf_edge.rbf_edge_features: [B,L,A,3]
    coords + [B,L,A] masks + [B,L,K] neighbors + reference-order [A*A*R, H]
    weights -> [B,L,K,H], equal (to fp32 rounding) to ``all_pair_rbf(...) @ W``
    but with per-class-pair FLOPs on class-pure tiles. Differentiable w.r.t.
    W only."""
    B, L, A_, _ = X_aug.shape
    K = E_idx.shape[2]
    assert A_ == A, (A_, A)
    E = B * L * K
    Ep = _round_up(E, EDGE_TILE)

    # Edge operand layout identical to the dense kernel (natural order);
    # tile classification happens inside the kernel from Mi/Mj.
    X_planes = jnp.concatenate(
        [X_aug[..., c].astype(jnp.float32) for c in range(3)], axis=-1)
    M_flat = X_m_aug.astype(jnp.float32)
    idx = E_idx.reshape(B, L * K)
    Xj = jnp.take_along_axis(X_planes, idx[..., None], axis=1)
    Mj = jnp.take_along_axis(M_flat, idx[..., None], axis=1)
    Xi = jnp.repeat(X_planes, K, axis=1)
    Mi = jnp.repeat(M_flat, K, axis=1)

    def _pad(x):
        x = x.reshape(E, x.shape[-1])
        return jnp.pad(x, ((0, Ep - E), (0, 0))) if Ep != E else x

    W0, W1, W2, W3 = split_weight_tables(W)
    sg = jax.lax.stop_gradient
    out = _classed_proj(
        sg(_pad(Xi)), sg(_pad(Xj)), sg(_pad(Mi)), sg(_pad(Mj)),
        W0.astype(jnp.float32), W1.astype(jnp.float32),
        W2.astype(jnp.float32), W3.astype(jnp.float32), compute_dtype,
        interpret)
    return out[:E].reshape(B, L, K, -1)
