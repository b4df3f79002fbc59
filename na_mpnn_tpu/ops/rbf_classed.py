"""Polymer-class-specialized fused RBF featurizer (Pallas TPU kernel).

The all-pair-atom RBF edge features (reference na_model_utils.py:433-443)
nominally span 18x18 atom pairs x 16 bins = 5184 dims per edge, but each
residue populates only its own polymer class's atoms: protein rows carry 5 of
the 18 atom slots (N, CA, C, O, virtual Cb) and nucleic rows carry 13
(11-12 backbone + virtual base-N).  Every atom pair whose endpoints straddle
an unpopulated slot is masked to zero before the projection, so the dense
18x18 computation wastes 75-92% of its FLOPs and transcendentals.

This kernel partitions the 18 atom slots into the protein block P (5) and the
nucleic block N (13) — the host permutes atom columns so each block is a
contiguous slice — giving four specialized atom-pair blocks:

    0: P-query x P-neighbor   ->  5x5x16  =  400-dim block
    1: P x N                  ->  5x13x16 = 1040
    2: N x P                  -> 1040
    3: N x N                  -> 13x13x16 = 2704
    4: fallback (mixed)       -> all four blocks summed (== dense, exactly)

Specialization is *opportunistic per tile*: edges stay in their natural
(query-major) order and a tile of EDGE_TILE consecutive edges runs a
specialized branch iff every edge in it has the same endpoint class pair —
else it takes the dense fallback. Classification happens inside the kernel
from the atom masks already resident in VMEM (slice max-reduces). Because
chains are contiguous and the K neighbors of a residue are spatially local,
the vast majority of tiles are pure; only class-interface tiles pay the
fallback. (Two earlier designs — globally sorting edges by group, and
computing per-tile group ids in XLA with scalar prefetch — both spent more
wall-clock on their unfusable index ops than the specialization saved.)

v2 (round 4): the pair-grid expansion is pure VPU. The v1 kernel built each
block's [T, Aq*An] distance grid with eight [T,18] @ [18,Aq*An] 0/1
"expansion" matmuls at fp32-HIGHEST (6 MXU passes each) — ~2.3x the MXU
occupancy of the useful projection matmul itself. Now the host permutes
atoms into block-contiguous order, queries arrive at node granularity
(EDGE_TILE/K rows — no host-side repeat), and the kernel broadcasts one
query column against a neighbor slice per pair row: zero matmuls outside
the projection. Masking rides the distance itself (masked pairs get
D=DIST_CAP, where every bin underflows to exactly 0.0f — identical to the
post-hoc mask multiply for finite coordinates). The bf16 path also
replaces the 16-exp bin loop with a two-sided geometric recursion
(3 exps + 1 reciprocal): f_r = f_0 * g^r * c_r walked up from bin 0 and
down from bin 15, taking the max — each side only underflows where the
other is exact, and the recursion's worst-case ~1e-4 relative error is
far below bf16's 2^-8 resolution. The fp32/interpret path keeps the exact
per-bin exp formulation for oracle parity.

Differentiable w.r.t. the projection weights only (coordinates and masks are
structural data with zero cotangents, matching ops.rbf_edge).

Negative result (measured, do not re-attempt): building the per-edge
coordinate/mask operands *inside* the kernel from VMEM-resident node tables
via one-hot selection matmuls (the design that wins in ops.message_kernels)
LOSES here — 10.1 ms vs 6.1 ms for the dense-operand path at B=8, L=768,
K=32, same process, interleaved. The selected operand is only ~90 columns
wide, so the [TILE, L] @ [L, 4A] selection matmuls cost far more than the
HBM gather they replace. The message kernels win the same trade because
their tables are H/3H columns wide, already bf16, and each tile's message
MLP dwarfs the selection.
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
# + virtual Cb at 16 + virtual base-N at 17), in REFERENCE atom order.
P_SEL = (0, 1, 2, 3, 16)                                  # N, CA, C, O, vCb
N_SEL = (4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 17)    # NA backbone + vN
GROUP_SELS = [(P_SEL, P_SEL), (P_SEL, N_SEL), (N_SEL, P_SEL), (N_SEL, N_SEL)]
NUM_GROUPS = 5  # 4 specialized + fallback

# Host-side permutation into block-contiguous order: P = cols [0,5),
# N = cols [5,18). Kernel-side blocks are static slices of this frame.
PERM = list(P_SEL) + list(N_SEL)
NP_ = len(P_SEL)
GROUP_SLICES = [((0, NP_) if sq == P_SEL else (NP_, A),
                 (0, NP_) if sn == P_SEL else (NP_, A))
                for sq, sn in GROUP_SELS]

# Distances are capped here before binning: every RBF bin at DIST_CAP
# underflows to exactly 0.0f (exp(-((50-22)/1.25)^2) = e^-502 = 0), and all
# true bins are already exactly 0 for any D >= ~40, so the cap is lossless.
# Masked pairs are driven to the cap, replacing the post-exp mask multiply.
DIST_CAP = 50.0


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


# Sentinel offset applied to masked atoms' x-plane: any pair with a masked
# endpoint gets |dx| >= MASK_FAR - (coordinate span), so D floors at
# DIST_CAP after the cap. Coordinates are capped far below this.
MASK_FAR = 1e4


def _expansion(sq, sn):
    """0/1 expansion matrices EA/EB [A, Aq*An] (iota-built) mapping the
    per-atom planes onto the (query, neighbor) pair grid for one
    block-contiguous slice pair."""
    q0, q1 = sq
    n0, n1 = sn
    An = n1 - n0
    AA = (q1 - q0) * An
    row = jax.lax.broadcasted_iota(jnp.int32, (A, AA), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (A, AA), 1)
    EA = (row == (q0 + col // An)).astype(jnp.float32)
    EB = (row == (n0 + col % An)).astype(jnp.float32)
    return EA, EB


def _expansion_bd(sq, sn, side, dtype):
    """Block-diagonal 0/1 expansion [3A, 3*AA] mapping the CONCATENATED
    three coordinate planes onto three side-by-side pair grids in ONE dot:
    plane p of the input feeds columns [p*AA, (p+1)*AA). Fusing the planes
    triples the contraction depth (K=54 vs 18), which the MXU pads to its
    tile anyway — one dot at K=54 beats three at K=18."""
    q0, q1 = sq
    n0, n1 = sn
    An = n1 - n0
    AA = (q1 - q0) * An
    row = jax.lax.broadcasted_iota(jnp.int32, (3 * A, 3 * AA), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (3 * A, 3 * AA), 1)
    p_r, a = row // A, row % A
    p_c, c = col // AA, col % AA
    tgt = (q0 + c // An) if side == "q" else (n0 + c % An)
    return ((p_r == p_c) & (a == tgt)).astype(dtype)


def _sel2(x, E):
    """f32-accurate selection through a 0/1 matrix with two DEFAULT-precision
    bf16 passes: x = hi + lo splits exactly enough that the reconstructed
    selection error is <= |x| * 2^-17 (~3e-3 A at the 327 A coordinate cap —
    ~2x below the 0.005 A wire quantization already accepted, and harmless
    against the 1.56 A RBF sigma). Each output element is a single product,
    so no cancellation can amplify the error. Replaces the 6-pass
    fp32-HIGHEST dot (3x the MXU passes at the same K)."""
    xh = x.astype(jnp.bfloat16)
    xr = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda a: jnp.dot(a, E, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    return d(xh) + d(xr)


def _pair_distances_bf16(xq, xj, mq, mj, sq, sn, K):
    """bf16-path masked pair distances [QT*K, AA]: node-granular queries
    (expanded BEFORE the K-fold edge replication — 1/K the query-side MXU
    work), one block-diagonal 3-plane dot per side, bf16x2 selection."""
    q0, q1 = sq
    n0, n1 = sn
    AA = (q1 - q0) * (n1 - n0)
    Eq = _expansion_bd(sq, sn, "q", jnp.bfloat16)
    En = _expansion_bd(sq, sn, "n", jnp.bfloat16)
    xq_adj = jnp.concatenate(
        [xq[:, :A] + (1.0 - mq) * MASK_FAR, xq[:, A:]], axis=1)
    xj_adj = jnp.concatenate(
        [xj[:, :A] - (1.0 - mj) * MASK_FAR, xj[:, A:]], axis=1)
    Q = _rep_edges(_sel2(xq_adj, Eq), K)          # [QT*K, 3*AA]
    J = _sel2(xj_adj, En)                         # [QT*K, 3*AA]
    D2 = jnp.full((J.shape[0], AA), 1e-6, jnp.float32)
    for p in range(3):
        d = Q[:, p * AA:(p + 1) * AA] - J[:, p * AA:(p + 1) * AA]
        D2 = D2 + d * d
    return jnp.minimum(jnp.sqrt(D2), DIST_CAP)


def _pair_distances(xi, xj, mi, mj, sq, sn, compute_dtype=jnp.bfloat16):
    """Masked pair distances for one block: [T, Aq*An].

    Pair grids are built on the MXU with 0/1 expansion matmuls — one per
    coordinate plane per side. (The v2 design built them with a per-query-
    atom VPU loop of [T, An]-wide ops; those sub-register-width operations
    were the ENTIRE gap to the kernel's no-bins floor — a one-q stand-in
    measured 2.96 ms vs 7.8 ms real, same process.) Masks don't need their
    own expansions: masked atoms' x-plane is driven MASK_FAR apart before
    expansion, so masked pairs exceed DIST_CAP and every bin underflows to
    exactly 0."""
    q0, q1 = sq
    n0, n1 = sn
    T = xi.shape[0]
    AA = (q1 - q0) * (n1 - n0)
    # 0/1 selection: one nonzero product per output, so HIGHEST is exact;
    # Mosaic supports only DEFAULT/HIGHEST for in-kernel dots.
    prec = jax.lax.Precision.HIGHEST
    EA, EB = _expansion(sq, sn)
    xix = xi[:, :A] + (1.0 - mi) * MASK_FAR
    xjx = xj[:, :A] - (1.0 - mj) * MASK_FAR
    planes_i = (xix, xi[:, A:2 * A], xi[:, 2 * A:])
    planes_j = (xjx, xj[:, A:2 * A], xj[:, 2 * A:])
    D2 = jnp.full((T, AA), 1e-6, jnp.float32)
    for pi, pj in zip(planes_i, planes_j):
        d = (jnp.dot(pi, EA, preferred_element_type=jnp.float32,
                     precision=prec)
             - jnp.dot(pj, EB, preferred_element_type=jnp.float32,
                       precision=prec))
        D2 = D2 + d * d
    return jnp.minimum(jnp.sqrt(D2), DIST_CAP)


def _bins_exact(D, num_rbf, compute_dtype):
    """Per-bin exp formulation (fp32/oracle path): list of R [T, AA] blocks.

    Blocks stay SEPARATE (no lane concatenation): the projection consumes
    them as R accumulating matmuls against static r-slices of the weight
    table. Assembling a [T, R*AA] operand from 13+16 sub-vreg-width pieces
    cost more vector-register shift-writes than the whole projection
    (measured: 7.8 ms with assembly vs 3.0 ms with a concat-free stand-in,
    same process)."""
    sigma = (RBF_D_MAX - RBF_D_MIN) / num_rbf
    step = (RBF_D_MAX - RBF_D_MIN) / (num_rbf - 1)
    blocks = []
    for r in range(num_rbf):
        z = (D - (RBF_D_MIN + r * step)) * (1.0 / sigma)
        blocks.append(jnp.exp(-z * z).astype(compute_dtype))
    return blocks


def bin_fold_scales(num_rbf=NUM_RBF):
    """Per-bin constants e^{c·r·(R-1-r)} folded OUT of the recursion and
    INTO the weight-table rows (host side): with them removed, both
    recursion walks become pure geometric series — one vector multiply per
    bin per side instead of two."""
    sigma = (RBF_D_MAX - RBF_D_MIN) / num_rbf
    step = (RBF_D_MAX - RBF_D_MIN) / (num_rbf - 1)
    c = step * step / (sigma * sigma)
    r = np.arange(num_rbf, dtype=np.float64)
    return np.exp(c * r * (num_rbf - 1 - r)).astype(np.float32)


def _bins_recursive(D, num_rbf, compute_dtype):
    """Two-sided DAMPED geometric recursion (3 exps + 1 reciprocal total):
    bf16 production path.

    True bins: f_r(D) = exp(-((D-mu_0-r*step)/sigma)^2)
             = f_lo * g^r * e^{-r^2 c}            (up form)
             = f_hi * g1^{-(R-1-r)} * e^{-m^2 c}  (down form, m = R-1-r)
    with g = e^{2*step*(D-mu_0)/sigma^2}, g1 = g*e^{-2(R-1)c},
    c = (step/sigma)^2. Damping each walk's generator by K = e^{-(R-1)c}
    gives u_r = f_lo*(gK)^r and d_m = f_hi*(g1_inv K)^m, BOTH of which
    satisfy f_r = e^{c*r*(R-1-r)} * u_r = e^{c*r*(R-1-r)} * d_{R-1-r} —
    the SAME scalar (symmetry), which bin_fold_scales folds into the
    weight tables. So the kernel emits max(u_r, d_{R-1-r}) with one
    multiply per side per bin; u,d stay in [0,1] (no overflow), and each
    side underflows only where the other is exact — except both are damped
    by at most e^{-c((R-1)/2)^2} ≈ e^{-64}, so true bins below ~1e-11 of
    f32 tiny flush to 0 (≤1e-9 relative effect on the projection, far
    below bf16 resolution; the fp32/oracle path keeps per-bin exps)."""
    sigma = (RBF_D_MAX - RBF_D_MIN) / num_rbf
    step = (RBF_D_MAX - RBF_D_MIN) / (num_rbf - 1)
    inv_s2 = 1.0 / (sigma * sigma)
    c = step * step * inv_s2
    R = num_rbf
    t0 = D - RBF_D_MIN                      # D - mu_0
    t1 = D - RBF_D_MAX                      # D - mu_{R-1}
    # Flush subnormal seeds to zero: a denormal f_lo/f_hi (~1e-45, ~70%
    # relative error) amplified by the walk's e^{+47}-scale generators
    # would otherwise beat the accurate opposite side in the max.
    tiny = np.float32(1.2e-38)
    f_lo = jnp.exp(-(t0 * t0) * inv_s2)
    f_lo = jnp.where(f_lo < tiny, 0.0, f_lo)
    f_hi = jnp.exp(-(t1 * t1) * inv_s2)
    f_hi = jnp.where(f_hi < tiny, 0.0, f_hi)
    g = jnp.exp((2.0 * step * inv_s2) * t0)  # arg <= 2*48*1.333/1.5625 ≈ 82
    K = np.float32(np.exp(-(R - 1) * c))
    gK = g * K                              # up generator (damped)
    # down generator: g1_inv*K = (1/g)*e^{2(R-1)c}*e^{-(R-1)c} = e^{(R-1)c}/g
    g1K = np.float32(np.exp((R - 1) * c)) / g
    up, down = [None] * R, [None] * R
    up[0], down[R - 1] = f_lo, f_hi
    for r in range(1, R):
        up[r] = up[r - 1] * gK
        down[R - 1 - r] = down[R - r] * g1K
    return [jnp.maximum(up[r], down[r]).astype(compute_dtype)
            for r in range(R)]


def _rbf_block(xq, xj, mq, mj, sq, sn, K, num_rbf, compute_dtype,
               bd_dist=True):
    """Masked RBF bins for one atom-pair block: R separate [QT*K, Aq*An]
    arrays (bin-r block of the kernel-order r-major table layout). Queries
    arrive NODE-granular [QT, .]; the bf16 path expands them before edge
    replication, the exact fp32/oracle path replicates first. bd_dist
    selects the block-diagonal bf16x2 pair grid (fastest in the forward)
    vs the per-plane fp32-HIGHEST grid (measured faster inside the
    dw-accumulating backward kernel)."""
    if compute_dtype == jnp.bfloat16:
        if bd_dist:
            D = _pair_distances_bf16(xq, xj, mq, mj, sq, sn, K)
        else:
            D = _pair_distances(_rep_edges(xq, K), xj, _rep_edges(mq, K),
                                mj, sq, sn, compute_dtype)
        return _bins_recursive(D, num_rbf, compute_dtype)
    xi = _rep_edges(xq, K)
    mi = _rep_edges(mq, K)
    D = _pair_distances(xi, xj, mi, mj, sq, sn, compute_dtype)
    return _bins_exact(D, num_rbf, compute_dtype)


def _proj_precision(compute_dtype):
    return (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _rep_edges(a, K):
    """Node-granular rows [QT, C] -> edge-granular [QT*K, C] (row i copied
    to rows i*K..): leading-dim broadcast + reshape, no lane movement."""
    QT, C = a.shape
    return jnp.broadcast_to(a[:, None, :], (QT, K, C)).reshape(QT * K, C)


def _tile_gid(mq, mj):
    """In-kernel tile classification from the (PERM-ordered) atom masks:
    endpoint side codes (0 = P-block only/empty, 1 = N-block only,
    2 = mixed) of the tile's NODE-granular queries and edge-granular
    neighbors; the tile is (g, pure) where pure means every query shares
    one side and every neighbor shares one side. Group encoding: 0=PP 1=PN
    2=NP 3=NN; impure tiles take the dense fallback."""
    def side_code(m):
        has_p = jnp.max(m[:, :NP_], axis=1, keepdims=True) > 0
        has_n = jnp.max(m[:, NP_:], axis=1, keepdims=True) > 0
        return (has_n.astype(jnp.int32)
                + (has_n & has_p).astype(jnp.int32))          # [rows, 1]

    cq = side_code(mq)
    cn = side_code(mj)
    q_lo, q_hi = jnp.min(cq), jnp.max(cq)
    n_lo, n_hi = jnp.min(cn), jnp.max(cn)
    pure = (q_lo == q_hi) & (q_lo < 2) & (n_lo == n_hi) & (n_lo < 2)
    return 2 * q_lo + n_lo, pure


def _fwd_kernel(xq_ref, xj_ref, mq_ref, mj_ref, w0_ref, w1_ref,
                w2_ref, w3_ref, out_ref, *, K, num_rbf, compute_dtype):
    xq, mq = xq_ref[:], mq_ref[:]
    xj, mj = xj_ref[:], mj_ref[:]
    w_refs = [w0_ref, w1_ref, w2_ref, w3_ref]
    precision = _proj_precision(compute_dtype)
    g_lo, pure = _tile_gid(mq, mj)

    def block(g):
        bins = _rbf_block(xq, xj, mq, mj, *GROUP_SLICES[g], K, num_rbf,
                          compute_dtype)
        AA = bins[0].shape[1]
        w = w_refs[g]
        acc = None
        for r, b in enumerate(bins):
            p = jnp.dot(b, w[r * AA:(r + 1) * AA].astype(compute_dtype),
                        preferred_element_type=jnp.float32,
                        precision=precision)
            acc = p if acc is None else acc + p
        return acc

    for g in range(4):
        @pl.when(pure & (g_lo == g))
        def _(g=g):
            out_ref[:] = block(g)

    @pl.when(jnp.logical_not(pure))
    def _():
        # Mixed tile: the four blocks partition the full 18x18 pair grid,
        # so their sum is the dense result exactly.
        out_ref[:] = block(0) + block(1) + block(2) + block(3)


def _bwd_kernel(xq_ref, xj_ref, mq_ref, mj_ref, g_ref, dw0_ref,
                dw1_ref, dw2_ref, dw3_ref, *, K, num_rbf, compute_dtype):
    xq, mq = xq_ref[:], mq_ref[:]
    xj, mj = xj_ref[:], mj_ref[:]
    dw_refs = [dw0_ref, dw1_ref, dw2_ref, dw3_ref]
    precision = _proj_precision(compute_dtype)
    g_lo, pure = _tile_gid(mq, mj)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for dw in dw_refs:
            dw[:] = jnp.zeros_like(dw)

    def accum(g):
        bins = _rbf_block(xq, xj, mq, mj, *GROUP_SLICES[g], K, num_rbf,
                          compute_dtype)
        AA = bins[0].shape[1]
        gt = g_ref[:].astype(compute_dtype)
        for r, b in enumerate(bins):
            dw_refs[g][r * AA:(r + 1) * AA] += jax.lax.dot_general(
                b, gt, dimension_numbers=(((0,), (0,)), ((), ())),
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


def _tiling(K):
    """Edges per tile (a multiple of K) and query nodes per tile.

    QT must be a multiple of 8: Mosaic requires block second-minor dims
    divisible by 8 (caught at K=24 on the L=24 sampler shape — QT=10)."""
    QT = max(8, (EDGE_TILE // K) // 8 * 8)
    return QT * K, QT


@functools.partial(jax.jit, static_argnames=("K", "num_rbf", "compute_dtype",
                                             "interpret"))
def _classed_fwd(Xq, Xj, Mq, Mj, W0, W1, W2, W3, K, num_rbf=NUM_RBF,
                 compute_dtype=jnp.float32, interpret=False):
    C = Xj.shape[0]
    H = W0.shape[1]
    ETILE, QT = _tiling(K)
    assert C % ETILE == 0, (C, ETILE)
    sizes = _table_sizes(num_rbf)
    kernel = functools.partial(_fwd_kernel, K=K, num_rbf=num_rbf,
                               compute_dtype=compute_dtype)
    edge = lambda c: pl.BlockSpec((ETILE, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    node = lambda c: pl.BlockSpec((QT, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    # Average useful FLOPs (assumes ~even group mix; used only for scheduling).
    flops = 2 * C * (sum(sizes) // 2) * H
    return pl.pallas_call(
        kernel, grid=(C // ETILE,),
        in_specs=[node(3 * A), edge(3 * A), node(A), edge(A)]
        + [pl.BlockSpec((s, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
           for s in sizes],
        out_specs=edge(H),
        out_shape=jax.ShapeDtypeStruct((C, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=C * (3 * A + A + H) * 4,
            transcendentals=C * sum(sizes) // 2,
        ),
        interpret=interpret,
    )(Xq, Xj, Mq, Mj, W0, W1, W2, W3)


@functools.partial(jax.jit, static_argnames=("K", "num_rbf", "compute_dtype",
                                             "interpret"))
def _classed_dw(Xq, Xj, Mq, Mj, g, K, num_rbf=NUM_RBF,
                compute_dtype=jnp.float32, interpret=False):
    C = Xj.shape[0]
    H = g.shape[1]
    ETILE, QT = _tiling(K)
    assert C % ETILE == 0, (C, ETILE)
    sizes = _table_sizes(num_rbf)
    kernel = functools.partial(_bwd_kernel, K=K, num_rbf=num_rbf,
                               compute_dtype=compute_dtype)
    edge = lambda c: pl.BlockSpec((ETILE, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    node = lambda c: pl.BlockSpec((QT, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(C // ETILE,),
        in_specs=[node(3 * A), edge(3 * A), node(A), edge(A), edge(H)],
        out_specs=[pl.BlockSpec((s, H), lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for s in sizes],
        out_shape=[jax.ShapeDtypeStruct((s, H), jnp.float32) for s in sizes],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * (sum(sizes) // 2) * H,
            bytes_accessed=C * (3 * A + A + 2 * H) * 4,
            transcendentals=C * sum(sizes) // 2,
        ),
        interpret=interpret,
    )(Xq, Xj, Mq, Mj, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _classed_proj(Xq, Xj, Mq, Mj, W0, W1, W2, W3, K, compute_dtype,
                  interpret):
    return _classed_fwd(Xq, Xj, Mq, Mj, W0, W1, W2, W3, K,
                        compute_dtype=compute_dtype, interpret=interpret)


def _classed_proj_fwd(Xq, Xj, Mq, Mj, W0, W1, W2, W3, K, compute_dtype,
                      interpret):
    out = _classed_proj(Xq, Xj, Mq, Mj, W0, W1, W2, W3, K, compute_dtype,
                        interpret)
    return out, (Xq, Xj, Mq, Mj)


def _classed_proj_bwd(K, compute_dtype, interpret, res, g):
    Xq, Xj, Mq, Mj = res
    dws = _classed_dw(Xq, Xj, Mq, Mj, g.astype(jnp.float32), K,
                      compute_dtype=compute_dtype, interpret=interpret)
    zeros = (jnp.zeros_like(Xq), jnp.zeros_like(Xj),
             jnp.zeros_like(Mq), jnp.zeros_like(Mj))
    return zeros + tuple(dws)


_classed_proj.defvjp(_classed_proj_fwd, _classed_proj_bwd)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _prep_operands(X_aug_q, X_m_q, X_aug_k, X_m_k, E_idx):
    """PERM-ordered coordinate planes + masks: queries at node granularity
    [Bq*Lq(+pad), 3A]/[.., A], neighbors gathered per edge [E(+pad), ..]."""
    B, Lq = E_idx.shape[:2]
    K = E_idx.shape[2]
    ETILE, QT = _tiling(K)
    E = B * Lq * K
    Ep = _round_up(E, ETILE)
    nq_pad = Ep // K - B * Lq

    perm = jnp.asarray(PERM)
    Xq = X_aug_q[:, :, perm, :]
    Xk = X_aug_k[:, :, perm, :]
    Mq = X_m_q[:, :, perm].astype(jnp.float32)
    Mk = X_m_k[:, :, perm].astype(jnp.float32)

    Xq_planes = jnp.concatenate(
        [Xq[..., c].astype(jnp.float32) for c in range(3)], axis=-1)
    Xk_planes = jnp.concatenate(
        [Xk[..., c].astype(jnp.float32) for c in range(3)], axis=-1)
    # ONE flat row-gather of the [3A | A]-wide neighbor rows (take_rows
    # form, models.modules:69-83: take_along_axis with broadcast indices
    # lowers to an elementwise gather and costs ~4 ms at this shape).
    Lk = Xk_planes.shape[1]
    flat = (jnp.arange(B, dtype=jnp.int32)[:, None] * Lk
            + E_idx.reshape(B, Lq * K)).reshape(-1)
    XjMj = jnp.take(
        jnp.concatenate([Xk_planes, Mk], axis=-1).reshape(B * Lk, 4 * A),
        flat, axis=0, mode="clip")
    Xj = XjMj[:, :3 * A].reshape(B, Lq * K, 3 * A)
    Mj = XjMj[:, 3 * A:].reshape(B, Lq * K, A)

    def _pad_nodes(x):
        x = x.reshape(B * Lq, x.shape[-1])
        return jnp.pad(x, ((0, nq_pad), (0, 0))) if nq_pad else x

    def _pad_edges(x):
        x = x.reshape(E, x.shape[-1])
        return jnp.pad(x, ((0, Ep - E), (0, 0))) if Ep != E else x

    return (_pad_nodes(Xq_planes), _pad_edges(Xj), _pad_nodes(Mq),
            _pad_edges(Mj), E, K)


def _run(X_aug_q, X_m_q, X_aug_k, X_m_k, E_idx, W, compute_dtype, interpret):
    B, Lq = E_idx.shape[:2]
    Xq, Xj, Mq, Mj, E, K = _prep_operands(X_aug_q, X_m_q, X_aug_k, X_m_k,
                                          E_idx)
    tables = [w.astype(jnp.float32) for w in split_weight_tables(W)]
    if compute_dtype == jnp.bfloat16:
        # The bf16 kernel emits DAMPED bins (see _bins_recursive); the
        # per-bin fold constants ride the table rows. Gradients to W flow
        # through this scaling automatically (it sits outside the
        # custom-VJP projection).
        scales = jnp.asarray(bin_fold_scales())
        tables = [w * jnp.repeat(scales, w.shape[0] // NUM_RBF)[:, None]
                  for w in tables]
    W0, W1, W2, W3 = tables
    sg = jax.lax.stop_gradient
    out = _classed_proj(
        sg(Xq), sg(Xj), sg(Mq), sg(Mj),
        W0, W1, W2, W3, K, compute_dtype,
        interpret)
    return out[:E].reshape(B, Lq, K, -1)


def rbf_edge_features_classed_qk(X_aug_q, X_m_q, X_aug_k, X_m_k, E_idx, W,
                                 compute_dtype=jnp.float32, interpret=False):
    """Query/key variant for the edge-partitioned forward: local query rows
    [B,Lq,A,3] against globally-gathered neighbor rows ([B,Lk,A,3] indexed by
    E_idx [B,Lq,K]). Same kernel, same exact semantics."""
    assert X_aug_q.shape[2] == A, X_aug_q.shape
    return _run(X_aug_q, X_m_q, X_aug_k, X_m_k, E_idx, W, compute_dtype,
                interpret)


def rbf_edge_features_classed(X_aug, X_m_aug, E_idx, W,
                              compute_dtype=jnp.float32, interpret=False):
    """Drop-in replacement for ops.rbf_edge.rbf_edge_features: [B,L,A,3]
    coords + [B,L,A] masks + [B,L,K] neighbors + reference-order [A*A*R, H]
    weights -> [B,L,K,H], equal (to fp32 rounding) to ``all_pair_rbf(...) @ W``
    but with per-class-pair FLOPs on class-pure tiles. Differentiable w.r.t.
    W only."""
    assert X_aug.shape[2] == A, X_aug.shape
    return _run(X_aug, X_m_aug, X_aug, X_m_aug, E_idx, W, compute_dtype,
                interpret)
