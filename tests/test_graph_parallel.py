"""Edge-partitioned forward vs the single-device forward on a virtual mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from na_mpnn_tpu.models import ModelConfig, forward, init_params
from na_mpnn_tpu.parallel.graph_parallel import forward_graph_parallel
from na_mpnn_tpu.parallel.mesh import make_mesh

from ref_oracle import make_synthetic_structure

CFG = ModelConfig(dropout=0.0, kernels="xla")


@pytest.mark.parametrize("graph_axis", [2, 4])
def test_graph_parallel_matches_single_device(graph_axis):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_devices=2 * graph_axis, graph_axis=graph_axis)
    B, L = 2, 64
    batches = [make_synthetic_structure(L=L, seed=5 + i, n_protein=32, n_dna=16)
               for i in range(B)]
    batch = {k: jnp.concatenate([jnp.asarray(b[k]) for b in batches], 0)
             for k in batches[0]}
    rng = np.random.RandomState(0)
    order = np.stack([rng.permutation(L) for _ in range(B)]).astype(np.int32)

    params = init_params(jax.random.PRNGKey(0), CFG)
    ref_lp, _ = forward(params, CFG, {**batch, "decoding_order": jnp.asarray(order)})
    gp_lp = forward_graph_parallel(params, CFG, batch, mesh,
                                   decoding_order=jnp.asarray(order))
    np.testing.assert_allclose(np.asarray(gp_lp), np.asarray(ref_lp), atol=2e-4)


def test_graph_parallel_jits():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_devices=8, graph_axis=4)  # data=2
    B, L = 2, 64
    batches = [make_synthetic_structure(L=L, seed=9 + i, n_protein=32, n_dna=16)
               for i in range(B)]
    batch = {k: jnp.concatenate([jnp.asarray(b[k]) for b in batches], 0)
             for k in batches[0]}
    params = init_params(jax.random.PRNGKey(1), CFG)
    fn = jax.jit(lambda p, b: forward_graph_parallel(p, CFG, b, mesh))
    out = fn(params, batch)
    assert np.isfinite(np.asarray(out)).all()


def test_graph_parallel_gradients_match():
    """shard_map is differentiable: gradients through the edge-partitioned
    forward match the single-device forward (enables graph-parallel
    training for structures too large for one chip)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_devices=4, graph_axis=2)
    B, L = 2, 64
    batches = [make_synthetic_structure(L=L, seed=21 + i, n_protein=32, n_dna=16)
               for i in range(B)]
    batch = {k: jnp.concatenate([jnp.asarray(b[k]) for b in batches], 0)
             for k in batches[0]}
    order = jnp.tile(jnp.arange(L)[None], (B, 1))
    params = init_params(jax.random.PRNGKey(2), CFG)

    def loss_gp(p):
        lp = forward_graph_parallel(p, CFG, batch, mesh, decoding_order=order)
        return jnp.sum(lp * (jnp.arange(33) == 7))

    def loss_ref(p):
        lp, _ = forward(p, CFG, {**batch, "decoding_order": order})
        return jnp.sum(lp * (jnp.arange(33) == 7))

    g_gp = jax.grad(loss_gp)(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_gp = dict(jax.tree.leaves_with_path(g_gp))
    for path, g in jax.tree.leaves_with_path(g_ref):
        np.testing.assert_allclose(np.asarray(flat_gp[path]), np.asarray(g),
                                   atol=5e-3, err_msg=str(path))
