"""float64 gradient parity of the training loss against the torch reference.

Builds the reference training model, runs loss_smoothed with a fixed decode
order, backprops in torch; runs jax.grad of our loss with imported weights;
compares per-parameter gradients (mapped through the same state-dict
converter as the weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from na_mpnn_tpu.models import ModelConfig, forward, from_torch_state_dict
from na_mpnn_tpu.train.losses import (loss_smoothed,
                                      make_polymer_restype_masks,
                                      mask_for_loss)

from ref_oracle import (make_ref_training_model, make_synthetic_structure,
                        ref_double_mode, to_torch_feature_dict)

CFG = ModelConfig(dropout=0.0)


def test_training_grad_parity_float64():
    import torch
    from unittest import mock

    with jax.enable_x64(True), ref_double_mode():
        model = make_ref_training_model(seed=7, dtype="float64")
        params = from_torch_state_dict(model.state_dict(), CFG)
        batch_np = make_synthetic_structure(L=40, seed=31, n_protein=16, n_dna=16)
        fd = to_torch_feature_dict(batch_np, dtype="float64")
        batch = {k: jnp.asarray(v.astype(np.float64)
                                if v.dtype == np.float32 else v)
                 for k, v in batch_np.items()}
        L = batch["S"].shape[1]

        # reference side -------------------------------------------------
        ref = __import__("sys").modules["ref_na_model_utils"]
        torch.manual_seed(5)
        fixed = torch.randn(1, L)
        model.train(False)
        with mock.patch("torch.randn", lambda *a, **k: fixed):
            log_probs_t, _ = model(fd)
        chain_M = fd["mask"].to(fixed.dtype)
        decoding_order = np.argsort(((chain_M + 0.0001) * torch.abs(fixed)).numpy(),
                                    axis=-1)

        S_mask = torch.ones_like(fd["mask"])
        no_loss = [20, 25, 31, 32]
        for t in no_loss:
            S_mask = S_mask * (fd["S"] != t).to(S_mask.dtype)
        mfl_t = fd["mask"] * S_mask

        rm = make_polymer_restype_masks(True)
        polymer_restype_masks = {
            "protein": torch.tensor(rm["protein"]).double(),
            "dna": torch.tensor(rm["dna"]).double(),
            "rna": torch.tensor(rm["rna"]).double(),
        }
        polymer_masks_t = {"protein": fd["protein_mask"].double(),
                           "dna": fd["dna_mask"].double(),
                           "rna": fd["rna_mask"].double()}
        ppm_mask = torch.zeros_like(fd["mask"])
        aligned_ppm = torch.zeros(1, L, 33, dtype=torch.float64)
        _, loss_av_t = ref.loss_smoothed(
            fd["S"], log_probs_t, mfl_t.double(), polymer_masks_t,
            polymer_restype_masks,
            {"protein": 21.0, "dna": 5.0, "rna": 5.0},
            weight=0.1, tokens=100.0, num_letters=33,
            ppm_mask=ppm_mask, aligned_ppm=aligned_ppm)
        model.zero_grad()
        loss_av_t.backward()
        grad_sd = {name: p.grad if p.grad is not None else torch.zeros_like(p)
                   for name, p in model.named_parameters()}
        grads_ref = from_torch_state_dict(grad_sd, CFG)

        # jax side ---------------------------------------------------------
        def loss_fn(params):
            lp, _ = forward(params, CFG,
                            {**batch, "decoding_order": jnp.asarray(decoding_order)})
            mfl = mask_for_loss(batch["S"], batch["mask"]).astype(lp.dtype)
            pm = {"protein": batch["protein_mask"], "dna": batch["dna_mask"],
                  "rna": batch["rna_mask"]}
            _, loss_av = loss_smoothed(
                batch["S"], lp, mfl, pm, rm, weight=0.1, tokens=100.0,
                num_letters=33,
                ppm_mask=jnp.zeros_like(batch["mask"]),
                aligned_ppm=jnp.zeros((1, L, 33), jnp.float64))
            return loss_av

        loss_j, grads_j = jax.value_and_grad(loss_fn)(
            jax.tree.map(jnp.asarray, params))

        assert float(loss_j) == pytest.approx(float(loss_av_t), abs=1e-10)
        flat_ref = jax.tree.leaves_with_path(grads_ref)
        flat_j = dict(jax.tree.leaves_with_path(grads_j))
        checked = 0
        for path, g_ref in flat_ref:
            g_j = np.asarray(flat_j[path])
            np.testing.assert_allclose(g_j, np.asarray(g_ref), atol=1e-9,
                                       err_msg=str(path))
            checked += 1
        assert checked > 50


def test_ppm_soft_label_loss_grad_parity_float64():
    """Specificity-model training loss: PPM soft labels substituted into the
    one-hot targets where ppm_mask (reference loss_smoothed,
    na_model_utils.py:111-146) — gradient parity with an ACTIVE mask."""
    import torch

    with jax.enable_x64(True), ref_double_mode():
        model = make_ref_training_model(seed=11, dtype="float64")
        params = from_torch_state_dict(model.state_dict(), CFG)
        batch_np = make_synthetic_structure(L=32, seed=71, n_protein=12,
                                            n_dna=16)
        fd = to_torch_feature_dict(batch_np, dtype="float64")
        batch = {k: jnp.asarray(v.astype(np.float64)
                                if v.dtype == np.float32 else v)
                 for k, v in batch_np.items()}
        L = batch["S"].shape[1]

        rng = np.random.RandomState(3)
        ppm = rng.dirichlet(np.ones(4), size=(1, L)).astype(np.float64)
        aligned = np.zeros((1, L, 33))
        aligned[..., 21:25] = ppm          # DA..DT columns carry the PPM
        ppm_mask_np = (batch_np["dna_mask"] * (rng.rand(1, L) > 0.3)).astype(
            np.float64)

        order = np.argsort(rng.rand(1, L), axis=-1)

        ref = __import__("sys").modules["ref_na_model_utils"]
        model.train(False)
        from unittest import mock
        fixed = torch.randn(1, L)
        with mock.patch("torch.randn", lambda *a, **k: fixed):
            log_probs_t, _ = model(fd)
        decoding_order = np.argsort(
            ((fd["mask"].to(fixed.dtype) + 0.0001) * torch.abs(fixed)).numpy(),
            axis=-1)

        mfl_t = fd["mask"].double()
        rm = make_polymer_restype_masks(True)
        polymer_restype_masks = {k: torch.tensor(rm[k]).double()
                                 for k in ("protein", "dna", "rna")}
        polymer_masks_t = {"protein": fd["protein_mask"].double(),
                           "dna": fd["dna_mask"].double(),
                           "rna": fd["rna_mask"].double()}
        _, loss_av_t = ref.loss_smoothed(
            fd["S"], log_probs_t, mfl_t, polymer_masks_t,
            polymer_restype_masks,
            {"protein": 21.0, "dna": 5.0, "rna": 5.0},
            weight=0.1, tokens=100.0, num_letters=33,
            ppm_mask=torch.tensor(ppm_mask_np),
            aligned_ppm=torch.tensor(aligned))
        model.zero_grad()
        loss_av_t.backward()
        grads_ref = from_torch_state_dict(
            {name: p.grad if p.grad is not None else torch.zeros_like(p)
             for name, p in model.named_parameters()}, CFG)

        def loss_fn(params):
            lp, _ = forward(params, CFG,
                            {**batch, "decoding_order": jnp.asarray(decoding_order)})
            mfl = batch["mask"].astype(lp.dtype)
            pm = {"protein": batch["protein_mask"], "dna": batch["dna_mask"],
                  "rna": batch["rna_mask"]}
            _, loss_av = loss_smoothed(
                batch["S"], lp, mfl, pm, rm, weight=0.1, tokens=100.0,
                num_letters=33, ppm_mask=jnp.asarray(ppm_mask_np),
                aligned_ppm=jnp.asarray(aligned))
            return loss_av

        loss_j, grads_j = jax.value_and_grad(loss_fn)(
            jax.tree.map(jnp.asarray, params))
        assert float(loss_j) == pytest.approx(float(loss_av_t), abs=1e-10)
        flat_j = dict(jax.tree.leaves_with_path(grads_j))
        for path, g_ref in jax.tree.leaves_with_path(grads_ref):
            np.testing.assert_allclose(np.asarray(flat_j[path]),
                                       np.asarray(g_ref), atol=1e-9,
                                       err_msg=str(path))
