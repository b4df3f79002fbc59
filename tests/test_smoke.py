"""Fast shape/invariant smoke tests (tiny shapes; no torch oracle)."""
import jax
import jax.numpy as jnp
import numpy as np

from na_mpnn_tpu import constants
from na_mpnn_tpu.models import (ModelConfig, forward, init_params, sample,
                                score, unconditional_probs)
from na_mpnn_tpu.models.mpnn import build_decode_groups, sample_tied

from ref_oracle import make_synthetic_structure

CFG = ModelConfig(dropout=0.0)


def _batch(L=24, seed=0):
    b = make_synthetic_structure(L=L, seed=seed, n_protein=10, n_dna=8)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_forward_shapes_and_normalization():
    batch = _batch()
    log_probs, probs = forward(init_params(jax.random.PRNGKey(0), CFG), CFG,
                               batch, key=jax.random.PRNGKey(1))
    assert log_probs.shape == (1, 24, 33)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0, atol=3e-4)
    np.testing.assert_allclose(np.asarray(jnp.sum(jnp.exp(log_probs), -1)),
                               1.0, atol=3e-4)


def test_forward_training_mode_runs():
    cfg = ModelConfig(dropout=0.1, protein_augment_eps=0.1, dna_augment_eps=0.1,
                      rna_augment_eps=0.1)
    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), cfg)
    lp, _ = forward(params, cfg, batch, key=jax.random.PRNGKey(2),
                    deterministic=False)
    assert np.isfinite(np.asarray(lp)).all()


def test_sample_fixed_positions_and_probs():
    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), CFG)
    chain_mask = np.ones((1, 24), np.int32)
    chain_mask[0, :5] = 0
    out = sample(params, CFG, {**batch, "chain_mask": jnp.asarray(chain_mask)},
                 key=jax.random.PRNGKey(3), num_samples=3, temperature=0.5)
    S = np.asarray(out["S"])
    assert S.shape == (3, 24)
    np.testing.assert_array_equal(S[:, :5], np.asarray(batch["S"])[0, :5][None].repeat(3, 0))
    # sampled tokens never land on omitted classes
    omit = constants.tokens_with_no_loss(True)
    assert not np.isin(S[:, 5:], omit).any()
    probs = np.asarray(out["sampling_probs"])
    np.testing.assert_allclose(probs[:, 5:].sum(-1), 1.0, atol=3e-4)
    assert np.abs(probs[:, :5]).max() == 0.0


def test_sample_tied_groups():
    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), CFG)
    chain_mask = jnp.ones((1, 24), jnp.int32)
    base_order = np.arange(24)
    groups, weights, flat = build_decode_groups(
        base_order, [[0, 1, 2], [5, 6]], [[1.0, 1.0, 1.0], [2.0, 0.5]], 24)
    out = sample_tied(params, CFG, {**batch, "chain_mask": chain_mask},
                      jax.random.PRNGKey(5), groups, weights, flat,
                      num_samples=2, temperature=0.4)
    S = np.asarray(out["S"])
    assert (S[:, 0] == S[:, 1]).all() and (S[:, 1] == S[:, 2]).all()
    assert (S[:, 5] == S[:, 6]).all()


def test_score_and_unconditional():
    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), CFG)
    out = score(params, CFG, {**batch, "chain_mask": jnp.ones((1, 24), jnp.int32)},
                key=jax.random.PRNGKey(1))
    assert out["log_probs"].shape == (1, 24, 33)
    out2 = unconditional_probs(params, CFG, batch)
    assert np.isfinite(np.asarray(out2["log_probs"])).all()


def test_checkpoint_roundtrip(tmp_path):
    from na_mpnn_tpu.train.checkpoint import (load_checkpoint_npz,
                                              save_checkpoint_npz,
                                              save_torch_checkpoint,
                                              load_params_any)
    params = init_params(jax.random.PRNGKey(0), CFG)
    p = str(tmp_path / "m.npz")
    save_checkpoint_npz(p, params, meta={"step": 42})
    loaded, meta, _ = load_checkpoint_npz(p)
    assert meta["step"] == 42
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # torch interchange roundtrip
    pt = str(tmp_path / "m.pt")
    save_torch_checkpoint(pt, params, CFG, meta={"step": 42, "epoch": 1,
                                                 "save_step": 0})
    loaded2, meta2 = load_params_any(pt, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_pt_export_loads_into_reference_model(tmp_path):
    """Our exported .pt checkpoint must load into the reference torch model
    with strict=True — key-for-key, shape-for-shape schema interchange, so
    reference users can consume checkpoints trained here."""
    import torch

    from na_mpnn_tpu.train.checkpoint import save_torch_checkpoint
    from ref_oracle import make_ref_inference_model

    params = init_params(jax.random.PRNGKey(3), CFG)
    pt = str(tmp_path / "export.pt")
    save_torch_checkpoint(pt, params, CFG, meta={"step": 7, "epoch": 1,
                                                 "save_step": 0})
    payload = torch.load(pt, map_location="cpu", weights_only=False)
    model = make_ref_inference_model(seed=0)
    missing_unexpected = model.load_state_dict(payload["model_state_dict"],
                                               strict=True)
    assert not missing_unexpected.missing_keys
    assert not missing_unexpected.unexpected_keys
    # spot-check an actual tensor round-trips into the torch module
    w_out = np.asarray(params["W_out"]["w"]).T
    np.testing.assert_allclose(model.W_out.weight.detach().numpy(), w_out,
                               atol=0)


def test_losses():
    from na_mpnn_tpu.train.losses import (loss_nll, loss_smoothed,
                                          make_polymer_restype_masks,
                                          mask_for_loss,
                                          compute_canonical_base_pair_accuracy)
    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), CFG)
    log_probs, _ = forward(params, CFG, batch, key=jax.random.PRNGKey(1))
    mfl = mask_for_loss(batch["S"], batch["mask"]).astype(jnp.float32)
    loss, loss_av, tf = loss_nll(batch["S"], log_probs, mfl)
    assert np.isfinite(float(loss_av))
    rm = make_polymer_restype_masks(True)
    pm = {"protein": batch["protein_mask"], "dna": batch["dna_mask"],
          "rna": batch["rna_mask"]}
    ppm_mask = jnp.zeros_like(batch["mask"])
    aligned = jnp.zeros((1, 24, 33), jnp.float64)
    _, ls_av = loss_smoothed(batch["S"], log_probs, mfl, pm, rm,
                             ppm_mask=ppm_mask, aligned_ppm=aligned)
    assert np.isfinite(float(ls_av))
    cbp = compute_canonical_base_pair_accuracy(
        log_probs, jnp.zeros_like(batch["mask"]),
        jnp.zeros_like(batch["S"]))
    assert cbp.shape == (1, 24)


def test_train_step_runs():
    from na_mpnn_tpu.train.trainer import Trainer
    from na_mpnn_tpu.train.collate import collate_batch
    from ref_oracle import make_synthetic_structure

    s1 = make_synthetic_structure(L=20, seed=1, n_protein=8, n_dna=8)
    s2 = make_synthetic_structure(L=16, seed=2, n_protein=8, n_dna=4)
    structures = []
    for s in (s1, s2):
        d = {k: np.asarray(v)[0] for k, v in s.items()}
        d["interface_mask"] = np.zeros(len(d["S"]), np.int32)
        d["base_pair_mask"] = np.zeros(len(d["S"]), np.int32)
        d["base_pair_index"] = np.zeros(len(d["S"]), np.int64)
        d["canonical_base_pair_mask"] = np.zeros(len(d["S"]), np.int32)
        d["canonical_base_pair_index"] = np.zeros(len(d["S"]), np.int64)
        d["aligned_ppm"] = np.zeros([len(d["S"]), 33], np.float64)
        d["ppm_mask"] = np.zeros(len(d["S"]), np.int32)
        structures.append(d)
    np_batch = collate_batch(structures, pad_to=32)
    assert np_batch["X"].shape[1] == 32

    cfg = ModelConfig(dropout=0.1, protein_augment_eps=0.1,
                      dna_augment_eps=0.1, rna_augment_eps=0.1)
    tr = Trainer(cfg, seed=0)
    p0 = np.asarray(jax.tree.leaves(tr.params)[0]).copy()
    m = tr.train_step(np_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss_av"]))
    p1 = np.asarray(jax.tree.leaves(tr.params)[0])
    assert not np.array_equal(p0, p1)
    em = tr.eval_step(np_batch)
    assert np.isfinite(np.asarray(em["loss_per_token"]).sum())
