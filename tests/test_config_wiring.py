"""Training-config wiring: MIXED_PRECISION -> bf16 policy and
ATOMS_TO_LOAD -> atom-table layout.

The reference training driver consumes both keys (na_run.py:34-41 builds the
16- or 65-atom ``atom_list_to_save``; :216-237 gates AMP on MIXED_PRECISION).
Here they map to ModelConfig.compute_dtype / ModelConfig.atom_table; the
65-atom ("all") forward is proven by float64 oracle parity against the
reference training model constructed with the same atom_dict.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from na_mpnn_tpu import constants
from na_mpnn_tpu.models import ModelConfig, forward, from_torch_state_dict
from na_mpnn_tpu.train.trainer import model_config_from_params


def test_config_key_wiring():
    cfg = model_config_from_params({"MIXED_PRECISION": 1,
                                    "ATOMS_TO_LOAD": "all"})
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.atom_table == "all"
    assert cfg.total_atoms == constants.NUM_ALL_ATOMS + 2  # + Cb + base-N
    assert cfg.edge_in == 16 + 16 * cfg.total_atoms ** 2
    assert cfg.na_ref_atom_idx == constants.ALL_ATOM_ORDER["C1'"]

    cfg = model_config_from_params({"MIXED_PRECISION": 0})
    assert cfg.compute_dtype == "float32"
    assert cfg.atom_table == "backbone"
    assert cfg.total_atoms == constants.NUM_BACKBONE_ATOMS + 2


def _widen_to_all_atoms(batch):
    """Scatter a 16-atom synthetic batch into the 65-atom table layout."""
    idx = [constants.ALL_ATOM_ORDER[a] for a in constants.BACKBONE_ATOMS]
    X16, X16_m = batch["X"], batch["X_m"]
    B, L = X16.shape[:2]
    X = np.zeros([B, L, constants.NUM_ALL_ATOMS, 3], X16.dtype)
    X_m = np.zeros([B, L, constants.NUM_ALL_ATOMS], X16_m.dtype)
    X[:, :, idx] = X16
    X_m[:, :, idx] = X16_m
    return {**batch, "X": X, "X_m": X_m}


@pytest.mark.slow
def test_all_atom_table_forward_parity():
    """float64 parity of the training forward on the 65-atom table
    (ATOMS_TO_LOAD="all"): same math as the reference model built with the
    65-atom atom_dict, atol 1e-8."""
    import torch
    from unittest import mock

    from ref_oracle import (load_ref_module, make_synthetic_structure,
                            ref_double_mode, to_torch_feature_dict)

    cfg = ModelConfig(dropout=0.0, atom_table="all")
    with jax.enable_x64(True), ref_double_mode():
        ref = load_ref_module("na_model_utils.py", "ref_na_model_utils")
        torch.manual_seed(5)
        model = ref.ProteinMPNN(
            node_features=128, edge_features=128, hidden_dim=128,
            num_encoder_layers=3, num_decoder_layers=3, k_neighbors=32,
            vocab=constants.VOCAB_SIZE, num_letters=constants.NUM_LETTERS,
            protein_augment_eps=0.0, dna_augment_eps=0.0, rna_augment_eps=0.0,
            dropout=0.0, decode_protein_first=0,
            atom_dict=dict(constants.ALL_ATOM_ORDER),
            restype_to_int=constants.restype_to_int_table(True),
            polytype_to_int=dict(constants.POLYTYPE_TO_INT))
        model = model.double().eval()
        params = from_torch_state_dict(model.state_dict(), cfg)
        # The edge embedding really is the 65-atom-sized one.
        assert params["features"]["edge_embedding"]["w"].shape[0] == cfg.edge_in

        batch_np = _widen_to_all_atoms(
            make_synthetic_structure(L=48, seed=7, n_protein=24, n_dna=12))
        fd = to_torch_feature_dict(batch_np, dtype="float64")
        batch = {k: jnp.asarray(v.astype(np.float64)
                                if v.dtype == np.float32 else v)
                 for k, v in batch_np.items()}

        L = batch["S"].shape[1]
        torch.manual_seed(3)
        fixed = torch.randn(1, L).double()
        with torch.no_grad(), mock.patch("torch.randn", lambda *a, **k: fixed):
            log_probs_t, _ = model(fd)
        chain_M = fd["mask"].to(fixed.dtype)
        decoding_order = np.argsort(
            ((chain_M + 0.0001) * torch.abs(fixed)).numpy(), axis=-1)

        log_probs, _ = forward(
            params, cfg, {**batch, "decoding_order": jnp.asarray(decoding_order)})
        np.testing.assert_allclose(np.asarray(log_probs), log_probs_t.numpy(),
                                   atol=1e-8)
