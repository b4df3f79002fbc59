"""End-to-end CLI smoke tests on the reference example structures
(the de-facto acceptance tests; reference README.md:70-127)."""
import os

import numpy as np
import pytest

EXAMPLES = "/root/reference/inference/examples"


@pytest.fixture(scope="module")
def random_ckpt(tmp_path_factory):
    import jax
    from na_mpnn_tpu.models import ModelConfig, init_params
    from na_mpnn_tpu.train.checkpoint import save_checkpoint_npz

    cfg = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path_factory.mktemp("ckpt") / "model.npz")
    save_checkpoint_npz(path, params, meta={"step": 0})
    return path


def test_design_mode_4oqu(random_ckpt, tmp_path):
    from na_mpnn_tpu.cli.run import apply_mode_defaults, build_argparser, main

    out = str(tmp_path / "out")
    args = build_argparser().parse_args([
        "--mode", "design",
        "--checkpoint_na_mpnn", random_ckpt,
        "--pdb_path", f"{EXAMPLES}/4oqu.pdb",
        "--out_folder", out,
        "--seed", "7",
        "--batch_size", "2",
        "--number_of_batches", "2",
        "--save_stats", "1",
        "--stats_format", "npz",
        # omit protein letters: the random-weight model has no learned
        # preference for NA tokens (the trained checkpoints do)
        "--omit_AA", "ARNDCQEGHILKMFPSTWYVX",
    ])
    args = apply_mode_defaults(args)
    main(args)

    fasta = out + "/seqs/4oqu.fa"
    assert os.path.exists(fasta)
    entries = open(fasta).read().split(">")[1:]
    assert len(entries) == 1 + 4  # native + B*num_batches
    # 4oqu is an RNA monomer: with protein letters omitted, designed letters
    # must be RNA chars (b/d/h/u; mapped from shared DNA tokens via O2'
    # presence, reference inference/run.py:119-123,469-472).
    for e in entries[1:]:
        seq = e.strip().split("\n")[-1]
        assert set(seq) <= set("bdhu"), seq
    assert os.path.exists(out + "/backbones/4oqu_1.pdb")
    assert os.path.exists(out + "/stats/4oqu.npz")

    stats = np.load(out + "/stats/4oqu.npz")
    assert stats["generated_sequences"].shape == (4, 97)
    # reproducibility: same seed -> same sequences
    out2 = str(tmp_path / "out2")
    args.out_folder = out2
    main(args)
    s2 = np.load(out2 + "/stats/4oqu.npz")["generated_sequences"]
    np.testing.assert_array_equal(stats["generated_sequences"], s2)


def test_specificity_mode_1am9(random_ckpt, tmp_path):
    from na_mpnn_tpu.cli.run import apply_mode_defaults, build_argparser, main
    from na_mpnn_tpu import constants

    out = str(tmp_path / "spec")
    args = build_argparser().parse_args([
        "--mode", "specificity",
        "--checkpoint_na_mpnn", random_ckpt,
        "--pdb_path", f"{EXAMPLES}/1am9.pdb",
        "--out_folder", out,
        "--seed", "11",
        "--batch_size", "3",
        "--number_of_batches", "1",
        "--omit_AA", "ARNDCQEGHILKMFPSTWYVX",
        "--design_na_only", "1",
        "--output_specificity", "1",
        "--output_pdbs", "0",
    ])
    args = apply_mode_defaults(args)
    main(args)

    spec = np.load(out + "/specificity/1am9.npz", allow_pickle=True)
    ppm = spec["predicted_ppm"]
    assert ppm.shape == (389, constants.NUM_LETTERS)
    dna = spec["dna_mask"].astype(bool)
    # Designed (DNA) rows are probability distributions over the 4 DNA tokens.
    table = constants.restype_to_int_table(True)
    na_cols = [table["DA"], table["DC"], table["DG"], table["DT"]]
    rows = ppm[dna]
    np.testing.assert_allclose(rows.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(rows[:, na_cols].sum(-1), 1.0, atol=1e-5)
    # Protein rows are fixed -> zero sampling probs.
    prot = spec["protein_mask"].astype(bool)
    assert np.abs(ppm[prot]).max() == 0.0


def test_symmetry_and_fixed_residues_4oqu(random_ckpt, tmp_path):
    from na_mpnn_tpu.cli.run import apply_mode_defaults, build_argparser, main

    out = str(tmp_path / "sym")
    args = build_argparser().parse_args([
        "--mode", "design",
        "--checkpoint_na_mpnn", random_ckpt,
        "--pdb_path", f"{EXAMPLES}/4oqu.pdb",
        "--out_folder", out,
        "--seed", "3",
        "--batch_size", "1",
        "--symmetry_residues", "A1,A2|A3,A4",
        "--symmetry_weights", "1.0,1.0|2.0,0.5",
        "--fixed_residues", "A5 A6",
        "--save_stats", "1",
        "--stats_format", "npz",
        "--output_pdbs", "0",
    ])
    args = apply_mode_defaults(args)
    main(args)
    stats = np.load(out + "/stats/4oqu.npz", allow_pickle=True)
    S = stats["generated_sequences"][0]
    S_native = stats["native_sequence"]
    # 4oqu chain A starts at resnum 1 -> indices 0,1 tied and 2,3 tied.
    assert S[0] == S[1]
    assert S[2] == S[3]
    # fixed residues keep native identity
    assert S[4] == S_native[4] and S[5] == S_native[5]


def test_fixed_pos_by_pdb_and_misc_flags(random_ckpt, tmp_path):
    """fixed_pos_by_pdb JSON, redesigned_residues, parse_these_chains_only,
    file_ending, bias_AA (reference inference/run.py:236-343)."""
    import json
    from na_mpnn_tpu.cli.run import apply_mode_defaults, build_argparser, main

    fixed_json = tmp_path / "fixed.json"
    json.dump({f"{EXAMPLES}/4oqu.pdb": ["A1", "A2", "A3"]}, open(fixed_json, "w"))
    out = str(tmp_path / "o1")
    args = build_argparser().parse_args([
        "--mode", "design", "--checkpoint_na_mpnn", random_ckpt,
        "--fixed_pos_by_pdb", str(fixed_json), "--out_folder", out,
        "--seed", "5", "--batch_size", "1", "--save_stats", "1",
        "--stats_format", "npz", "--output_pdbs", "0", "--file_ending", "_v2",
        "--bias_AA", "b:2.0",
    ])
    main(apply_mode_defaults(args))
    assert os.path.exists(out + "/seqs/4oqu.fa_v2")
    stats = np.load(out + "/stats/4oqu.npz")
    S = stats["generated_sequences"][0]
    np.testing.assert_array_equal(S[:3], stats["native_sequence"][:3])

    # redesigned_residues: ONLY those positions change; chain selection parses
    out2 = str(tmp_path / "o2")
    args = build_argparser().parse_args([
        "--mode", "design", "--checkpoint_na_mpnn", random_ckpt,
        "--pdb_path", f"{EXAMPLES}/4oqu.pdb", "--out_folder", out2,
        "--seed", "5", "--batch_size", "1", "--save_stats", "1",
        "--stats_format", "npz", "--output_pdbs", "0",
        "--redesigned_residues", "A4 A5", "--parse_these_chains_only", "A",
    ])
    main(apply_mode_defaults(args))
    stats2 = np.load(out2 + "/stats/4oqu.npz")
    cm = stats2["chain_mask"]
    assert cm.sum() == 2 and cm[3] == 1 and cm[4] == 1
    S2 = stats2["generated_sequences"][0]
    native = stats2["native_sequence"]
    fixed_idx = np.where(cm == 0)[0]
    np.testing.assert_array_equal(S2[fixed_idx], native[fixed_idx])


def test_pad_to_bucket_score_parity_and_cli(random_ckpt, tmp_path):
    """--pad_to_bucket: padded rows are inert — teacher-forced log_probs on
    real rows match the unpadded run exactly, and the CLI truncates every
    output back to the true length (TPU-side compile-amortization feature;
    no reference counterpart — torch recompiles nothing)."""
    import jax.numpy as jnp
    import numpy as np
    from na_mpnn_tpu.cli.run import apply_mode_defaults, build_argparser, main
    from na_mpnn_tpu.data.featurize import featurize_inference
    from na_mpnn_tpu.data.pdb import parse_pdb
    from na_mpnn_tpu.models import ModelConfig, init_params
    from na_mpnn_tpu.models.mpnn import score

    import jax
    parsed = parse_pdb(f"{EXAMPLES}/4oqu.pdb")
    L = len(parsed["S"])
    chain_mask = np.ones([L], np.int32)
    cfg = ModelConfig(dropout=0.0)
    params = init_params(jax.random.PRNGKey(0), cfg)

    b0 = featurize_inference(parsed, chain_mask)
    b1 = featurize_inference(parsed, chain_mask, pad_to=128)
    assert int(b1["mask"].shape[1]) == 128
    order0 = jnp.arange(L)[None]
    order1 = jnp.arange(128)[None]  # pad rows decode last
    lp0 = score(params, cfg, b0, decoding_order=order0)["log_probs"]
    lp1 = score(params, cfg, b1, decoding_order=order1)["log_probs"]
    np.testing.assert_allclose(np.asarray(lp1[:, :L]), np.asarray(lp0),
                               rtol=0, atol=2e-5)

    out = str(tmp_path / "pad")
    args = build_argparser().parse_args([
        "--mode", "design", "--checkpoint_na_mpnn", random_ckpt,
        "--pdb_path", f"{EXAMPLES}/4oqu.pdb", "--out_folder", out,
        "--seed", "7", "--batch_size", "2", "--save_stats", "1",
        "--stats_format", "npz", "--pad_to_bucket", "64",
        "--omit_AA", "ARNDCQEGHILKMFPSTWYVX",
    ])
    main(apply_mode_defaults(args))
    stats = np.load(out + "/stats/4oqu.npz")
    assert stats["generated_sequences"].shape == (2, L)   # truncated (97<128)
    assert stats["decoding_order"].shape == (2, L)
    assert sorted(stats["decoding_order"][0].tolist()) == list(range(L))
    entries = open(out + "/seqs/4oqu.fa").read().split(">")[1:]
    for e in entries[1:]:
        seq = e.strip().split("\n")[-1]
        assert len(seq) == L and set(seq) <= set("bdhu"), seq


def test_score_mode_4oqu(random_ckpt, tmp_path):
    """--mode score: teacher-forced log-probs + unconditional probs, no
    sampling (models.score / unconditional_probs wired to the CLI)."""
    from na_mpnn_tpu.cli.run import apply_mode_defaults, build_argparser, main

    out = str(tmp_path / "score")
    args = build_argparser().parse_args([
        "--mode", "score",
        "--checkpoint_na_mpnn", random_ckpt,
        "--pdb_path", f"{EXAMPLES}/4oqu.pdb",
        "--out_folder", out,
        "--seed", "3",
        "--batch_size", "2",
        "--number_of_batches", "2",
        "--stats_format", "npz",
        "--pad_to_bucket", "64",
    ])
    args = apply_mode_defaults(args)
    main(args)

    assert not os.path.exists(out + "/seqs/4oqu.fa")      # no sampling outputs
    stats = np.load(out + "/stats/4oqu.npz")
    L = 97
    assert stats["log_probs"].shape == (4, L, 33)
    assert stats["unconditional_log_probs"].shape == (L, 33)
    assert stats["mean_probs"].shape == (L, 33)
    assert np.allclose(np.exp(stats["log_probs"]).sum(-1), 1.0, atol=1e-3)
    assert stats["loss"].shape == (4,)
    assert np.isfinite(stats["loss"]).all()
    assert stats["recovery_argmax"].shape == (4,)
    assert (0 <= stats["recovery_argmax"]).all() and (stats["recovery_argmax"] <= 1).all()
    # decode orders differ across draws but cover all positions
    assert sorted(stats["decoding_order"][0].tolist()) == list(range(L))
    # log-prob rows are order-dependent only through masking; teacher-forced
    # scores of the SAME order batch must reproduce with the same seed
    out2 = str(tmp_path / "score2")
    args.out_folder = out2
    main(args)
    s2 = np.load(out2 + "/stats/4oqu.npz")
    np.testing.assert_array_equal(stats["log_probs"], s2["log_probs"])
