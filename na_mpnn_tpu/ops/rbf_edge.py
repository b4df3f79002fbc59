"""Fused RBF featurizer + edge-embedding projection (Pallas TPU kernel).

The reference materializes a [B,L,K,A*A*R] RBF tensor (A=18 atoms, R=16 bins
-> 5184 floats/edge, ~4 GB at training shapes) and then projects it to 128
dims (reference na_model_utils.py:433-443,507-509). That intermediate is pure
HBM-bandwidth waste: this kernel computes the pairwise atom distances, the
Gaussian RBF expansion, the atom-validity masking, and the [5184 x 128]
projection tile-by-tile in VMEM, so the 5184-dim representation never exists
in HBM.

TPU layout strategy (Mosaic dislikes >2D vectors with small trailing dims):
everything stays 2D. Pair index j in [0, A*A) is laid out j = b*A + a
(a = source atom, b = neighbor atom); per-atom [T,A] arrays are expanded to
[T,A*A] with two constant 0/1 "expansion" matmuls built from iota
(EA[p, j] = [j%A == p], EB[p, j] = [j//A == p]). The 16 RBF bins are emitted
as 16 concatenated [T,A*A] blocks (bin-major), and the projection weights are
row-permuted outside the kernel to match:

    kernel row r*A*A + b*A + a  <->  reference row (a*A + b)*R + r.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.features import RBF_D_MAX, RBF_D_MIN

A = 18          # atoms per residue incl. virtual Cb + base-N
NUM_RBF = 16
EDGE_TILE = 256  # edges per grid step


def _kernel(xi_ref, xj_ref, mi_ref, mj_ref, w_ref, out_ref, *, num_rbf,
            compute_dtype):
    AA = A * A
    # Expansion matrices: EA[p, j] = (j % A == p); EB[p, j] = (j // A == p).
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (A, AA), 1)
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (A, AA), 0)
    EA = (j_ids % A == p_ids).astype(jnp.float32)
    EB = (j_ids // A == p_ids).astype(jnp.float32)

    def expand(v, E):  # [T, A] -> [T, A*A]
        # HIGHEST precision: the expansion is a 0/1 gather pattern — a
        # single-pass bf16 dot would round the raw coordinates (|x| up to
        # ~1e2 Å) to ~0.4 Å before subtraction and wreck the RBF values.
        return jnp.dot(v, E, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    xi = xi_ref[:]  # [T, 3*A]: x|y|z concatenated per-coordinate planes
    xj = xj_ref[:]
    D2 = jnp.full(out_ref.shape[:1] + (AA,), 1e-6, jnp.float32)
    for c in range(3):
        d = expand(xi[:, c * A:(c + 1) * A], EA) - expand(xj[:, c * A:(c + 1) * A], EB)
        D2 = D2 + d * d
    D = jnp.sqrt(D2)                                        # [T, A*A]
    mask = expand(mi_ref[:], EA) * expand(mj_ref[:], EB)    # [T, A*A]

    sigma = (RBF_D_MAX - RBF_D_MIN) / num_rbf
    blocks = []
    for r in range(num_rbf):
        mu_r = RBF_D_MIN + r * (RBF_D_MAX - RBF_D_MIN) / (num_rbf - 1)
        z = (D - mu_r) * (1.0 / sigma)
        blocks.append(jnp.exp(-z * z) * mask)
    R = jnp.concatenate(blocks, axis=1).astype(compute_dtype)  # [T, R*A*A]

    # Projection: bf16 single-pass when compute_dtype is bfloat16 (the fast
    # path; RBF values are in [0,1] so bf16 relative error is benign), exact
    # fp32 otherwise (parity path).
    precision = (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.dot(R, w_ref[:].astype(compute_dtype),
                         preferred_element_type=jnp.float32,
                         precision=precision)


def rbf_weight_permutation(num_rbf=NUM_RBF) -> np.ndarray:
    """perm such that W_kernel = W_ref[perm]: reference row order
    (a*A+b)*R + r -> kernel order r*A*A + b*A + a."""
    a, b, r = np.meshgrid(np.arange(A), np.arange(A), np.arange(num_rbf),
                          indexing="ij")
    orig = ((a * A + b) * num_rbf + r).reshape(-1)
    new = (r * A * A + b * A + a).reshape(-1)
    perm = np.empty(A * A * num_rbf, np.int64)
    perm[new] = orig
    return perm


def permute_rbf_weight(W, num_rbf=NUM_RBF):
    return jnp.take(jnp.asarray(W), rbf_weight_permutation(num_rbf), axis=0)


@functools.partial(jax.jit, static_argnames=("num_rbf", "compute_dtype",
                                             "interpret"))
def rbf_edge_embed(Xi, Xj, Mi, Mj, W_perm, num_rbf=NUM_RBF,
                   compute_dtype=jnp.float32, interpret=False):
    """Fused masked all-pair-atom RBF + projection.

    Xi, Xj: [E, 3*A] coords as concatenated x|y|z planes; Mi, Mj: [E, A]
    atom masks; W_perm: [R*A*A, H] kernel-order weights (permute_rbf_weight).
    Returns [E, H] float32. E must be a multiple of EDGE_TILE.
    """
    E = Xi.shape[0]
    H = W_perm.shape[1]
    assert E % EDGE_TILE == 0, E
    grid = (E // EDGE_TILE,)

    kernel = functools.partial(_kernel, num_rbf=num_rbf,
                               compute_dtype=compute_dtype)
    flops = 2 * E * (A * A * num_rbf) * H
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((EDGE_TILE, 3 * A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_TILE, 3 * A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_TILE, A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_TILE, A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A * A * num_rbf, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EDGE_TILE, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=E * (2 * 3 * A + 2 * A + H) * 4 + W_perm.size * 4,
            transcendentals=E * A * A * num_rbf,
        ),
        interpret=interpret,
    )(Xi, Xj, Mi, Mj, W_perm)


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Backward: dW accumulation (coordinates/masks are data — their cotangents
# are defined as zero; differentiate w.r.t. the projection weights only).
# ---------------------------------------------------------------------------

def _bwd_kernel(xi_ref, xj_ref, mi_ref, mj_ref, g_ref, dw_ref, *, num_rbf,
                compute_dtype):
    """Recompute the tile's RBF block and accumulate dW += R^T @ g."""
    AA = A * A
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (A, AA), 1)
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (A, AA), 0)
    EA = (j_ids % A == p_ids).astype(jnp.float32)
    EB = (j_ids // A == p_ids).astype(jnp.float32)

    def expand(v, E):
        return jnp.dot(v, E, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    xi = xi_ref[:]
    xj = xj_ref[:]
    D2 = jnp.full((xi.shape[0], AA), 1e-6, jnp.float32)
    for c in range(3):
        d = expand(xi[:, c * A:(c + 1) * A], EA) - expand(xj[:, c * A:(c + 1) * A], EB)
        D2 = D2 + d * d
    D = jnp.sqrt(D2)
    mask = expand(mi_ref[:], EA) * expand(mj_ref[:], EB)

    sigma = (RBF_D_MAX - RBF_D_MIN) / num_rbf
    blocks = []
    for r in range(num_rbf):
        mu_r = RBF_D_MIN + r * (RBF_D_MAX - RBF_D_MIN) / (num_rbf - 1)
        z = (D - mu_r) * (1.0 / sigma)
        blocks.append(jnp.exp(-z * z) * mask)
    R = jnp.concatenate(blocks, axis=1).astype(compute_dtype)

    precision = (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    dw = jax.lax.dot_general(
        R, g_ref[:].astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw_ref[:] += dw


@functools.partial(jax.jit, static_argnames=("num_rbf", "compute_dtype",
                                             "interpret"))
def rbf_edge_embed_dw(Xi, Xj, Mi, Mj, g, num_rbf=NUM_RBF,
                      compute_dtype=jnp.float32, interpret=False):
    """dL/dW_perm for rbf_edge_embed: [R*A*A, H] = sum_t R[t,:]^T g[t,:]."""
    E = Xi.shape[0]
    H = g.shape[1]
    assert E % EDGE_TILE == 0, E
    grid = (E // EDGE_TILE,)
    kernel = functools.partial(_bwd_kernel, num_rbf=num_rbf,
                               compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((EDGE_TILE, 3 * A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_TILE, 3 * A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_TILE, A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_TILE, A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_TILE, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Constant index map: the dW block stays resident in VMEM and is
        # accumulated across sequential grid steps.
        out_specs=pl.BlockSpec((A * A * num_rbf, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A * A * num_rbf, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * (A * A * num_rbf) * H,
            bytes_accessed=E * (2 * 3 * A + 2 * A + H) * 4,
            transcendentals=E * A * A * num_rbf,
        ),
        interpret=interpret,
    )(Xi, Xj, Mi, Mj, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _rbf_proj(Xi, Xj, Mi, Mj, W_perm, compute_dtype, interpret):
    return rbf_edge_embed(Xi, Xj, Mi, Mj, W_perm, compute_dtype=compute_dtype,
                          interpret=interpret)


def _rbf_proj_fwd(Xi, Xj, Mi, Mj, W_perm, compute_dtype, interpret):
    out = _rbf_proj(Xi, Xj, Mi, Mj, W_perm, compute_dtype, interpret)
    return out, (Xi, Xj, Mi, Mj)


def _rbf_proj_bwd(compute_dtype, interpret, residuals, g):
    Xi, Xj, Mi, Mj = residuals
    dW = rbf_edge_embed_dw(Xi, Xj, Mi, Mj, g.astype(jnp.float32),
                           compute_dtype=compute_dtype, interpret=interpret)
    # Coordinates/masks are structural data: zero cotangents by contract.
    return (jnp.zeros_like(Xi), jnp.zeros_like(Xj), jnp.zeros_like(Mi),
            jnp.zeros_like(Mj), dW)


_rbf_proj.defvjp(_rbf_proj_fwd, _rbf_proj_bwd)


def rbf_edge_features(X_aug, X_m_aug, E_idx, W, compute_dtype=jnp.float32,
                      interpret=False, w_is_permuted=False):
    """Batched wrapper: [B,L,A,3] coords + [B,L,A] masks + [B,L,K] neighbors
    + [A*A*R, H] reference-order weights -> [B,L,K,H] projected RBF edge
    features. Equivalent (to fp32 rounding) to ``all_pair_rbf(...) @ W``
    without materializing the [B,L,K,A*A*R] tensor. Differentiable w.r.t. W
    only (coordinate/mask cotangents are zero — they are structural data).
    """
    B, L, A_, _ = X_aug.shape
    K = E_idx.shape[2]
    assert A_ == A, (A_, A)
    H = W.shape[1]

    # x|y|z planes concatenated: [B,L,3*A]
    X_planes = jnp.concatenate(
        [X_aug[..., c].astype(jnp.float32) for c in range(3)], axis=-1)
    M_flat = X_m_aug.astype(jnp.float32)

    idx = E_idx.reshape(B, L * K)
    Xj = jnp.take_along_axis(X_planes, idx[..., None], axis=1)   # [B,L*K,3A]
    Mj = jnp.take_along_axis(M_flat, idx[..., None], axis=1)     # [B,L*K,A]
    Xi = jnp.repeat(X_planes, K, axis=1)
    Mi = jnp.repeat(M_flat, K, axis=1)

    W_perm = W if w_is_permuted else permute_rbf_weight(W)

    E = B * L * K
    Ep = _round_up(E, EDGE_TILE)

    def _pad(x):
        x = x.reshape(E, x.shape[-1])
        return jnp.pad(x, ((0, Ep - E), (0, 0))) if Ep != E else x

    sg = jax.lax.stop_gradient  # prune the zero-cotangent gather backward
    out = _rbf_proj(sg(_pad(Xi)), sg(_pad(Xj)), sg(_pad(Mi)), sg(_pad(Mj)),
                    W_perm.astype(jnp.float32), compute_dtype, interpret)
    return out[:E].reshape(B, L, K, H)
