"""Numerical parity of the JAX NA-MPNN against the reference torch model.

The reference model is randomly initialized (checkpoints are absent from the
snapshot), its weights are imported into the JAX pytree, and activations are
compared on identical synthetic structures:

* float64: bitwise-level agreement (atol 1e-8) — proves the math is identical.
* float32: loose agreement (atol 1e-3 on log-probs) — proves fp32 stability.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from na_mpnn_tpu import constants
from na_mpnn_tpu.models import (ModelConfig, encode, forward,
                                from_torch_state_dict, sample, score,
                                unconditional_probs)

from ref_oracle import (make_ref_inference_model, make_ref_training_model,
                        make_synthetic_structure, to_torch_feature_dict)

CFG = ModelConfig(dropout=0.0)


def _setup(dtype, L=64, seed=3, n_protein=None, n_dna=None):
    import torch
    model = make_ref_inference_model(seed=seed, dtype=dtype)
    params = from_torch_state_dict(model.state_dict(), CFG)
    n_protein = L // 2 if n_protein is None else n_protein
    n_dna = L // 4 if n_dna is None else n_dna
    batch_np = make_synthetic_structure(L=L, seed=seed + 10,
                                        n_protein=n_protein, n_dna=n_dna)
    fd = to_torch_feature_dict(batch_np, dtype=dtype)
    if dtype == "float64":
        batch = {k: jnp.asarray(v.astype(np.float64) if v.dtype == np.float32 else v)
                 for k, v in batch_np.items()}
    else:
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    return model, params, batch, fd


def _x64(dtype):
    """Combined context: JAX x64 + reference-torch float64 mode."""
    import contextlib
    from ref_oracle import ref_double_mode, null_ctx
    stack = contextlib.ExitStack()
    if dtype == "float64":
        stack.enter_context(jax.enable_x64(True))
        stack.enter_context(ref_double_mode())
    return stack


@pytest.mark.parametrize("dtype,atol", [("float64", 1e-8), ("float32", 5e-2)])
def test_encode_parity(dtype, atol):
    import torch
    with _x64(dtype):
        model, params, batch, fd = _setup(dtype)
        with torch.no_grad():
            h_V_t, h_E_t, E_idx_t = model.encode(fd)
        h_V, h_E, E_idx = encode(params, CFG, batch)
        np.testing.assert_array_equal(np.asarray(E_idx), E_idx_t.numpy())
        np.testing.assert_allclose(np.asarray(h_V), h_V_t.numpy(), atol=atol)
        np.testing.assert_allclose(np.asarray(h_E), h_E_t.numpy(), atol=atol)


@pytest.mark.parametrize("dtype,atol", [("float64", 1e-8), ("float32", 5e-2)])
def test_score_parity(dtype, atol):
    import torch
    with _x64(dtype):
        model, params, batch, fd = _setup(dtype)
        L = batch["S"].shape[1]
        torch.manual_seed(11)
        randn = torch.randn(1, L)
        if dtype == "float64":
            randn = randn.double()
        fd = dict(fd)
        fd["randn"] = randn
        fd["chain_mask"] = torch.ones(1, L, dtype=fd["mask"].dtype)
        fd["batch_size"] = 1
        with torch.no_grad():
            out_t = model.score(fd)
        decoding_order = jnp.asarray(out_t["decoding_order"].numpy())[None]
        out = score(params, CFG, {**batch, "chain_mask": jnp.ones((1, L), jnp.int32)},
                    decoding_order=decoding_order)
        np.testing.assert_allclose(np.asarray(out["log_probs"]),
                                   out_t["log_probs"].numpy(), atol=atol)


@pytest.mark.parametrize("dtype,atol", [("float64", 1e-8), ("float32", 5e-2)])
def test_unconditional_parity(dtype, atol):
    import torch
    with _x64(dtype):
        model, params, batch, fd = _setup(dtype)
        fd = dict(fd)
        fd["batch_size"] = 1
        with torch.no_grad():
            out_t = model.unconditional_probs(fd)
        out = unconditional_probs(params, CFG, batch)
        np.testing.assert_allclose(np.asarray(out["log_probs"]),
                                   out_t["log_probs"].numpy(), atol=atol)


@pytest.mark.parametrize("dtype,atol", [("float64", 1e-8), ("float32", 5e-2)])
def test_training_forward_parity(dtype, atol):
    """Parity against the reference *training* model's teacher-forced forward
    (reference na_model_utils.py:589-646), injecting the same decode order by
    patching torch.randn."""
    import torch
    from unittest import mock
    with _x64(dtype):
        model = make_ref_training_model(seed=5, dtype=dtype)
        params = from_torch_state_dict(model.state_dict(), CFG)
        batch_np = make_synthetic_structure(L=48, seed=21, n_protein=20, n_dna=16)
        fd = to_torch_feature_dict(batch_np, dtype=dtype)
        if dtype == "float64":
            batch = {k: jnp.asarray(v.astype(np.float64) if v.dtype == np.float32 else v)
                     for k, v in batch_np.items()}
        else:
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        L = batch["S"].shape[1]
        torch.manual_seed(3)
        fixed = torch.randn(1, L)
        if dtype == "float64":
            fixed = fixed.double()
        with torch.no_grad(), mock.patch("torch.randn", lambda *a, **k: fixed):
            log_probs_t, probs_t = model(fd)
        chain_M = fd["mask"].to(fixed.dtype)
        decoding_order = np.argsort(
            ((chain_M + 0.0001) * torch.abs(fixed)).numpy(), axis=-1)

        log_probs, probs = forward(params, CFG,
                                   {**batch, "decoding_order": jnp.asarray(decoding_order)})
        np.testing.assert_allclose(np.asarray(log_probs), log_probs_t.numpy(), atol=atol)
        np.testing.assert_allclose(np.asarray(probs), probs_t.numpy(), atol=atol)


@pytest.mark.parametrize("dtype,atol", [("float64", 1e-7), ("float32", 5e-2)])
def test_sample_parity_low_temperature(dtype, atol):
    """At T->0 sampling is deterministic argmax; the reference Python loop and
    our lax.scan must produce the same sequence, sampling probs and log probs
    when fed the same decode order."""
    import torch
    with _x64(dtype):
        model, params, batch, fd = _setup(dtype, L=48, seed=9)
        L = batch["S"].shape[1]
        torch.manual_seed(17)
        randn = torch.randn(1, L)
        if dtype == "float64":
            randn = randn.double()
        chain_mask_np = np.ones((1, L), np.int32)
        # Fix a third of the positions to exercise the fixed-residue path.
        chain_mask_np[0, ::3] = 0

        fd = dict(fd)
        fd["randn"] = randn
        fd["chain_mask"] = torch.from_numpy(chain_mask_np).to(fd["mask"].dtype)
        fd["batch_size"] = 1
        fd["temperature"] = 1e-4
        # Bias omitted tokens to -1e8, as the CLI does (reference
        # inference/run.py:350); otherwise the T->0 argmax may fall on a
        # zeroed token and the reference multinomial sees an all-zero row.
        table = constants.restype_to_int_table(True)
        omit_idx = [table[t] for t in ["UNK", "DX", "RX", "MAS", "PAD"]]
        bias_np = np.zeros((1, L, constants.NUM_LETTERS), np.float32)
        bias_np[:, :, omit_idx] = -1e8
        fd["bias"] = torch.from_numpy(bias_np).to(randn.dtype)
        fd["symmetry_residues"] = [[]]
        fd["symmetry_weights"] = [[]]
        with torch.no_grad():
            out_t = model.sample(fd)

        chain_mask_f = fd["mask"].to(randn.dtype) * fd["chain_mask"].to(randn.dtype)
        decoding_order = np.argsort(
            ((chain_mask_f + 0.0001) * torch.abs(randn)).numpy(), axis=-1)

        out = sample(params, CFG,
                     {**batch, "chain_mask": jnp.asarray(chain_mask_np),
                      "decoding_order": jnp.asarray(decoding_order)},
                     key=jax.random.PRNGKey(0), num_samples=1, temperature=1e-4,
                     bias=jnp.asarray(bias_np))
        np.testing.assert_array_equal(np.asarray(out["S"]), out_t["S"].numpy())
        np.testing.assert_allclose(np.asarray(out["log_probs"]),
                                   out_t["log_probs"].numpy(), atol=atol)
        # sampling_probs at T=1e-4 amplify fp32 logit noise by 1e4 near ties;
        # float64 checks them strictly, float32 only on average.
        probs_diff = np.abs(np.asarray(out["sampling_probs"])
                            - out_t["sampling_probs"].numpy())
        if dtype == "float64":
            assert probs_diff.max() < atol
        else:
            assert probs_diff.mean() < 1e-3


def test_sample_pair_bias_parity_float64():
    """Neighbor pair-bias sampling: our O(1)-per-step diagonal formulation vs
    the reference's dense [1,L,33,L,33] tensor (inference/data_utils.py:7-16,
    inference/model_utils.py:169-172,193-194)."""
    import torch
    from na_mpnn_tpu.data.featurize import make_pair_bias_ctx

    with _x64("float64"):
        model, params, batch, fd = _setup("float64", L=32, seed=13)
        L = 32
        torch.manual_seed(23)
        randn = torch.randn(1, L).double()
        chain_mask_np = np.ones((1, L), np.int32)

        # reference pair bias tensor (reimplemented here exactly as
        # inference/data_utils.make_pair_bias — that module imports prody and
        # cannot be loaded)
        nl = constants.NUM_LETTERS
        pair_bias_AA = torch.zeros(nl, nl, dtype=torch.float64)
        table = constants.restype_to_int_table(True)
        pair_bias_AA[table["DA"], table["DT"]] = -4.0
        pair_bias_AA[table["DG"], table["DC"]] = 3.0
        chain_labels = fd["chain_labels"][0]
        R_idx = fd["R_idx"][0]
        d_chains = ((chain_labels[:, None] - chain_labels[None, :]) == 0).long()
        upper = (R_idx[1:] - R_idx[:-1] == 1).long()
        lower = (R_idx[:-1] - R_idx[1:] == -1).long()
        u_mask = torch.diag(upper, 1) * d_chains
        l_mask = torch.diag(lower, -1) * d_chains
        pair_bias = (u_mask[None, :, None, :, None] * pair_bias_AA[None, None, :, None, :]
                     + l_mask[None, :, None, :, None]
                     * pair_bias_AA.T[None, None, :, None, :])

        omit_idx = [table[t] for t in ["UNK", "DX", "RX", "MAS", "PAD"]]
        bias_np = np.zeros((1, L, nl), np.float32)
        bias_np[:, :, omit_idx] = -1e8

        fd = dict(fd)
        fd["randn"] = randn
        fd["chain_mask"] = torch.from_numpy(chain_mask_np).to(fd["mask"].dtype)
        fd["batch_size"] = 1
        fd["temperature"] = 1e-4
        fd["bias"] = torch.from_numpy(bias_np).double()
        fd["pair_bias"] = pair_bias
        fd["symmetry_residues"] = [[]]
        fd["symmetry_weights"] = [[]]
        with torch.no_grad():
            out_t = model.sample(fd)

        decoding_order = np.argsort(
            ((fd["mask"].double() + 0.0001) * torch.abs(randn)).numpy(), axis=-1)
        ctx = make_pair_bias_ctx(np.asarray(batch["chain_labels"][0]),
                                 np.asarray(batch["R_idx"][0]),
                                 np.asarray(pair_bias_AA))
        out = sample(params, CFG,
                     {**batch, "chain_mask": jnp.asarray(chain_mask_np),
                      "decoding_order": jnp.asarray(decoding_order)},
                     key=jax.random.PRNGKey(0), num_samples=1, temperature=1e-4,
                     bias=jnp.asarray(bias_np), pair_bias_ctx=ctx)
        np.testing.assert_array_equal(np.asarray(out["S"]), out_t["S"].numpy())
        np.testing.assert_allclose(np.asarray(out["sampling_probs"]),
                                   out_t["sampling_probs"].numpy(), atol=1e-7)


def test_sample_tied_symmetry_parity_float64():
    """Symmetry-tied decoding: our padded-group scan vs the reference's
    symmetry branch (inference/model_utils.py:219-327) at T->0."""
    import torch
    from na_mpnn_tpu.models.mpnn import build_decode_groups, sample_tied

    with _x64("float64"):
        model, params, batch, fd = _setup("float64", L=32, seed=19)
        L = 32
        torch.manual_seed(29)
        randn = torch.randn(1, L).double()
        chain_mask_np = np.ones((1, L), np.int32)
        chain_mask_np[0, 6] = 0  # one fixed member inside a tied group

        table = constants.restype_to_int_table(True)
        omit_idx = [table[t] for t in ["UNK", "DX", "RX", "MAS", "PAD"]]
        bias_np = np.zeros((1, L, constants.NUM_LETTERS), np.float32)
        bias_np[:, :, omit_idx] = -1e8

        sym = [[2, 3, 4], [6, 7], [20, 25]]
        weights = [[1.0, 1.0, 1.0], [2.0, 0.5], [1.0, -1.0]]

        fd = dict(fd)
        fd["randn"] = randn
        fd["chain_mask"] = torch.from_numpy(chain_mask_np).to(fd["mask"].dtype)
        fd["batch_size"] = 1
        fd["temperature"] = 1e-4
        fd["bias"] = torch.from_numpy(bias_np).double()
        fd["symmetry_residues"] = sym
        fd["symmetry_weights"] = weights
        with torch.no_grad():
            out_t = model.sample(fd)

        chain_mask_f = fd["mask"].double() * fd["chain_mask"].double()
        base_order = np.argsort(
            ((chain_mask_f + 0.0001) * torch.abs(randn)).numpy(), axis=-1)[0]
        groups, gweights, flat = build_decode_groups(base_order, sym, weights, L)
        np.testing.assert_array_equal(flat, out_t["decoding_order"][0].numpy())

        out = sample_tied(params, CFG,
                          {**batch, "chain_mask": jnp.asarray(chain_mask_np)},
                          jax.random.PRNGKey(0), groups, gweights, flat,
                          num_samples=1, temperature=1e-4,
                          bias=jnp.asarray(bias_np))
        np.testing.assert_array_equal(np.asarray(out["S"]), out_t["S"].numpy())
        np.testing.assert_allclose(np.asarray(out["sampling_probs"]),
                                   out_t["sampling_probs"].numpy(), atol=1e-7)
        np.testing.assert_allclose(np.asarray(out["log_probs"]),
                                   out_t["log_probs"].numpy(), atol=1e-7)
