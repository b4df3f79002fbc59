"""Differentiable Pallas kernel tests (interpret mode): the class-specialized
RBF featurizer and the message-MLP kernels, forward and backward, against the
XLA formulations (which are themselves float64-parity-tested vs the torch
reference in test_parity_model / test_grad_parity)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import na_mpnn_tpu.ops as ops
from na_mpnn_tpu.models import ModelConfig, forward, init_params
from na_mpnn_tpu.models.features import all_pair_rbf
from na_mpnn_tpu.models.modules import (MESSAGE_SCALE, _message_tail,
                                        _split_w1, gather_nodes,
                                        init_enc_layer)
from na_mpnn_tpu.ops.message_kernels import (message_agg_batched,
                                             message_edge_batched)
from na_mpnn_tpu.ops.rbf_classed import rbf_edge_features_classed


def _rel(a, b):
    return float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)


@pytest.fixture
def rbf_case():
    rng = np.random.RandomState(0)
    B, L, K, A, R, H = 2, 40, 8, 18, 16, 128
    X = rng.randn(B, L, A, 3).astype(np.float32) * 5
    Xm = np.zeros((B, L, A), np.float32)
    Xm[:, :20, [0, 1, 2, 3, 16]] = 1              # protein rows
    Xm[:, 20:, 4:16] = 1
    Xm[:, 20:, 17] = 1                            # NA rows
    Xm[:, 38:] = 0                                # empty rows
    Xm[0, 5, 4] = 1                               # a mixed-class residue
    E_idx = rng.randint(0, L, (B, L, K)).astype(np.int32)
    W = rng.randn(A * A * R, H).astype(np.float32) * 0.01
    return map(jnp.asarray, (X, Xm, E_idx, W))


def test_classed_rbf_matches_dense(rbf_case):
    X, Xm, E_idx, W = rbf_case
    ref = all_pair_rbf(X, E_idx, Xm, 16) @ W
    out = rbf_edge_features_classed(X, Xm, E_idx, W, interpret=True)
    assert _rel(ref, out) < 2e-6


def test_classed_rbf_bf16_path_matches_dense(rbf_case):
    """The bf16 production path (block-diagonal bf16x2 pair-grid selection
    + geometric bin recursion) must track the dense fp32 reference to bf16
    resolution; masked pairs must still contribute exactly 0."""
    X, Xm, E_idx, W = rbf_case
    ref = all_pair_rbf(X, E_idx, Xm, 16) @ W
    out = rbf_edge_features_classed(X, Xm, E_idx, W,
                                    compute_dtype=jnp.bfloat16,
                                    interpret=True)
    assert _rel(ref, out) < 3e-2
    # rows whose query has no atoms at all (fully masked) must be exactly 0
    empty = np.asarray(ref) == 0.0
    assert np.all(np.asarray(out)[empty] == 0.0)


def test_classed_rbf_weight_gradient(rbf_case):
    X, Xm, E_idx, W = rbf_case
    g1 = jax.grad(lambda w: jnp.sum(
        rbf_edge_features_classed(X, Xm, E_idx, w, interpret=True) ** 2))(W)
    g2 = jax.grad(lambda w: jnp.sum(
        (all_pair_rbf(X, E_idx, Xm, 16) @ w) ** 2))(W)
    assert _rel(g2, g1) < 2e-5


@pytest.fixture
def layer_case():
    rng = np.random.RandomState(1)
    B, L, K, H = 2, 32, 8, 128
    p = init_enc_layer(jax.random.PRNGKey(0), H, 2 * H)
    h_V = jnp.asarray(rng.randn(B, L, H).astype(np.float32) * 0.5)
    h_E = jnp.asarray(rng.randn(B, L, K, H).astype(np.float32) * 0.5)
    E_idx = jnp.asarray(rng.randint(0, L, (B, L, K)).astype(np.int32))
    mask_att = jnp.asarray((rng.rand(B, L, K) > 0.2).astype(np.float32))
    return p, h_V, h_E, E_idx, mask_att


def test_message_agg_forward_and_grads(layer_case):
    p, h_V, h_E, E_idx, mask_att = layer_case
    H = h_V.shape[-1]

    def ref(pp, hv, he):
        (wa, wb, wc), b1 = _split_w1(pp, H, "W1")
        x = (jnp.dot(hv, wa)[:, :, None, :] + jnp.dot(he, wb)
             + gather_nodes(jnp.dot(hv, wc), E_idx) + b1)
        m = _message_tail(pp, x, "W2", "W3") * mask_att[..., None]
        return jnp.sum(m, axis=-2) / MESSAGE_SCALE

    def ker(pp, hv, he):
        (_, _, wc), _ = _split_w1(pp, H, "W1")
        G = gather_nodes(jnp.dot(hv, wc), E_idx)
        return message_agg_batched(pp, hv, he, G, mask_att, contract_e=True,
                                   interpret=True)

    assert _rel(ref(p, h_V, h_E), ker(p, h_V, h_E)) < 2e-6

    lr = lambda f: (lambda pp, hv, he: jnp.sum(f(pp, hv, he) ** 2))
    gr = jax.grad(lr(ref), argnums=(0, 1, 2))(p, h_V, h_E)
    gk = jax.grad(lr(ker), argnums=(0, 1, 2))(p, h_V, h_E)
    assert _rel(gr[1], gk[1]) < 5e-6   # h_V
    assert _rel(gr[2], gk[2]) < 5e-6   # h_E
    for a, b in zip(jax.tree.leaves(gr[0]), jax.tree.leaves(gk[0])):
        assert float(jnp.abs(a - b).max()) <= 5e-5 * (float(jnp.abs(a).max()) + 1e-6)


def test_message_edge_forward_and_grad(layer_case):
    p, h_V, h_E, E_idx, _ = layer_case
    H = h_V.shape[-1]

    def ref(hv):
        (wa, wb, wc), b1 = _split_w1(p, H, "W11")
        x = (jnp.dot(hv, wa)[:, :, None, :] + jnp.dot(h_E, wb)
             + gather_nodes(jnp.dot(hv, wc), E_idx) + b1)
        return _message_tail(p, x, "W12", "W13")

    def ker(hv):
        (_, _, wc), _ = _split_w1(p, H, "W11")
        G = gather_nodes(jnp.dot(hv, wc), E_idx)
        return message_edge_batched(p, hv, h_E, G, interpret=True)

    assert _rel(ref(h_V), ker(h_V)) < 2e-6
    ga = jax.grad(lambda hv: jnp.sum(ref(hv) ** 2))(h_V)
    gb = jax.grad(lambda hv: jnp.sum(ker(hv) ** 2))(h_V)
    assert _rel(ga, gb) < 5e-6


@pytest.mark.slow
def test_training_forward_fused_matches_xla(monkeypatch):
    """Full train-mode forward + gradients: Pallas kernel path (interpret)
    vs the XLA path, same keys, dropout off (different RNG streams)."""
    monkeypatch.setattr(ops, "INTERPRET", True)
    from __graft_entry__ import _synthetic_batch

    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=2, L=96).items()}
    key = jax.random.PRNGKey(3)
    cfg_x = ModelConfig(dropout=0.0, protein_augment_eps=0.1,
                        dna_augment_eps=0.1, kernels="xla")
    cfg_p = ModelConfig(dropout=0.0, protein_augment_eps=0.1,
                        dna_augment_eps=0.1, kernels="pallas")
    params = init_params(jax.random.PRNGKey(0), cfg_x)

    def loss(cfg):
        def f(p):
            lp, _ = forward(p, cfg, batch, key=key, deterministic=False)
            return jnp.sum(lp * jax.nn.one_hot(batch["S"], cfg.num_letters))
        return f

    lx, gx = jax.value_and_grad(loss(cfg_x))(params)
    lp_, gp = jax.value_and_grad(loss(cfg_p))(params)
    assert abs(float(lx - lp_)) / abs(float(lx)) < 1e-6
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        assert float(jnp.abs(a - b).max()) <= 1e-4 * (float(jnp.abs(a).max()) + 1e-6)


@pytest.mark.slow
def test_training_forward_fused_dropout_finite(monkeypatch):
    """Kernel path with dropout+noise on: runs and yields finite grads."""
    monkeypatch.setattr(ops, "INTERPRET", True)
    from __graft_entry__ import _synthetic_batch

    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=1, L=64).items()}
    cfg = ModelConfig(dropout=0.1, protein_augment_eps=0.1, kernels="pallas")
    params = init_params(jax.random.PRNGKey(0), cfg)

    def f(p):
        lp, _ = forward(p, cfg, batch, key=jax.random.PRNGKey(7),
                        deterministic=False)
        return jnp.mean(lp)

    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))
