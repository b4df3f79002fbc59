"""Batched multi-structure design (eval/batch_design.py): many PDBs through
one decode batch, per-structure FASTA outputs in the reference CLI format."""
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


def test_design_structures_batched(random_ckpt, tmp_path):
    from na_mpnn_tpu.eval.batch_design import design_structures
    from na_mpnn_tpu.eval.harness import read_fasta_file

    out = str(tmp_path / "bd")
    res = design_structures(
        [f"{EXAMPLES}/4oqu.pdb", f"{EXAMPLES}/1am9.pdb"],
        random_ckpt, out, samples_per_structure=2,
        batch_structures=4,            # both groups padded with dummy rows
        seed=11)
    assert set(res) == {"4oqu", "1am9"}

    # 4oqu: RNA monomer, protein letters omitted by default -> pure RNA chars
    entries = read_fasta_file(res["4oqu"]["fasta_path"])
    assert len(entries) == 3          # native + 2 samples
    for header, seq in entries[1:]:
        assert len(seq) == 97
        assert set(seq) <= set("bdhu"), seq
        assert "seq_rec=" in header and "overall_confidence=" in header

    # 1am9: protein-DNA complex with design_na_only -> protein rows keep
    # the native sequence, designed rows are DNA letters
    native = read_fasta_file(res["1am9"]["fasta_path"])[0][1].replace("/", "")
    for _, seq in read_fasta_file(res["1am9"]["fasta_path"])[1:]:
        flat = seq.replace("/", "")
        assert len(flat) == 389
        diffs = [i for i, (a, b) in enumerate(zip(flat, native)) if a != b]
        assert diffs, "nothing designed?"
        # design_na_only: every changed position is NA<->NA (shared DNA
        # tokens print a/c/g/t; b/d/h/u appear only via the O2' RNA
        # conversion) -- protein rows stay native.
        na_chars = set("acgtbdhuxX")
        assert all(native[i] in na_chars and flat[i] in na_chars
                   for i in diffs)
    assert all(0.0 <= r <= 1.0 for r in res["1am9"]["seq_rec"])

    # reproducibility: same seed -> same designs
    out2 = str(tmp_path / "bd2")
    res2 = design_structures(
        [f"{EXAMPLES}/4oqu.pdb", f"{EXAMPLES}/1am9.pdb"],
        random_ckpt, out2, samples_per_structure=2, batch_structures=4,
        seed=11)
    assert open(res["4oqu"]["fasta_path"]).read() \
        == open(res2["4oqu"]["fasta_path"]).read()


def test_seed_zero_records_drawn_seed(random_ckpt, tmp_path):
    """seed=0 draws a random seed; the FASTA headers must record the DRAWN
    value (cli/run contract), not the literal 0."""
    from na_mpnn_tpu.eval.batch_design import design_structures
    from na_mpnn_tpu.eval.harness import (parse_design_fasta_header,
                                          read_fasta_file)

    res = design_structures([f"{EXAMPLES}/4oqu.pdb"], random_ckpt,
                            str(tmp_path / "s0"), samples_per_structure=1,
                            batch_structures=1, seed=0)
    header = read_fasta_file(res["4oqu"]["fasta_path"])[1][0]
    assert int(parse_design_fasta_header(header)["seed"]) != 0


def test_write_design_json(random_ckpt, tmp_path):
    """--write_design_json emits the per-design dicts the monomer-RNA
    pipeline consumes (harness.design_nucleic_acid_sequence contract)."""
    import json

    from na_mpnn_tpu.eval.batch_design import design_structures

    out = str(tmp_path / "dj")
    design_structures([f"{EXAMPLES}/4oqu.pdb"], random_ckpt, out,
                      samples_per_structure=2, batch_structures=1, seed=3,
                      write_design_json=True)
    p1 = os.path.join(out, "4oqu", "design_json", "4oqu_1.json")
    p2 = os.path.join(out, "4oqu", "design_json", "4oqu_2.json")
    assert os.path.exists(p1) and os.path.exists(p2)
    d = json.load(open(p1))
    for k in ["input_structure_name", "input_structure_path", "design_id",
              "name", "design_sequence", "tool_reported_sequence_recovery",
              "design_method", "model_weights_path",
              "original_input_structure_path"]:
        assert k in d, k
    assert d["design_method"] == "na_mpnn" and d["name"] == "4oqu_1"
    assert len(d["design_sequence"]) == 97  # single chain, no separators


def test_predict_specificities_batched(random_ckpt, tmp_path):
    from na_mpnn_tpu import constants
    from na_mpnn_tpu.eval.batch_design import predict_specificities

    out = str(tmp_path / "spec")
    res = predict_specificities(
        [f"{EXAMPLES}/1am9.pdb"], random_ckpt, out,
        samples_per_structure=4, batch_structures=2, seed=5)
    d = np.load(res["1am9"]["ppm_path"], allow_pickle=True)
    ppm = d["predicted_ppm"]
    assert ppm.shape == (389, constants.NUM_LETTERS)
    # protein rows are fixed (design_na_only): no sampling mass recorded
    protein = d["protein_mask"].astype(bool)
    assert np.allclose(ppm[protein], 0.0)
    # designed DNA rows: a normalized distribution with omitted letters at 0
    dna = d["dna_mask"].astype(bool)
    assert np.allclose(ppm[dna].sum(-1), 1.0, atol=1e-5)
    omit_idx = [i for i, a in enumerate(constants.ALPHABET)
                if a in "ARNDCQEGHILKMFPSTWYVX"]
    assert np.allclose(ppm[dna][:, omit_idx], 0.0)
    assert len(d["encoded_residues"]) == 389


def test_sample_multi_equals_sample_single_structure():
    """For N=1, sample_multi must reproduce sample() exactly (same key, same
    replication semantics) — including the per-structure neighbor pair bias
    path, whose correctness then follows from sample()'s oracle parity."""
    import jax
    import jax.numpy as jnp

    from na_mpnn_tpu.data.featurize import make_pair_bias_ctx
    from na_mpnn_tpu.models import ModelConfig, init_params, sample
    from na_mpnn_tpu.models.mpnn import sample_multi
    from ref_oracle import make_synthetic_structure

    cfg = ModelConfig(dropout=0.0)
    params = init_params(jax.random.PRNGKey(1), cfg)
    b = {k: jnp.asarray(v)
         for k, v in make_synthetic_structure(L=40, seed=4, n_protein=20,
                                              n_dna=10).items()}
    b["chain_mask"] = b["mask"]

    P = np.zeros((33, 33), np.float32)
    P[1, 2], P[3, 3] = 1.5, -0.7
    ctx = make_pair_bias_ctx(np.asarray(b["chain_labels"][0]),
                             np.asarray(b["R_idx"][0]), P)
    key = jax.random.PRNGKey(7)
    out_a = sample(params, cfg, b, key, num_samples=3, temperature=0.3,
                   pair_bias_ctx=ctx)
    out_b = sample_multi(params, cfg, b, key, samples_per_structure=3,
                         temperature=0.3,
                         pair_bias_ctx={**ctx, "u_diag": ctx["u_diag"][None]})
    for k in out_a:
        np.testing.assert_array_equal(np.asarray(out_a[k]),
                                      np.asarray(out_b[k]), err_msg=k)


def test_parse_pair_bias_AA():
    from na_mpnn_tpu import constants
    from na_mpnn_tpu.eval.batch_design import parse_pair_bias_AA

    m = parse_pair_bias_AA("at:0.5,cg:-0.3")
    table = constants.restype_to_int_table(True)
    s2i = {constants.RESTYPE_3_TO_1[k]: v for k, v in table.items()}
    assert m[s2i["a"], s2i["t"]] == np.float32(0.5)
    assert m[s2i["c"], s2i["g"]] == np.float32(-0.3)
    assert np.count_nonzero(m) == 2


def test_batch_design_failure_catcher(random_ckpt, tmp_path):
    """Unparseable inputs are recorded under failed_inferences/ and skipped
    (batch analog of the reference --catch_failed_inferences files)."""
    from na_mpnn_tpu.eval.batch_design import design_structures

    bad = tmp_path / "garbage.pdb"
    bad.write_text("not a pdb\n")
    out = str(tmp_path / "fc")
    res = design_structures(
        [str(bad), f"{EXAMPLES}/4oqu.pdb"], random_ckpt, out,
        samples_per_structure=1, batch_structures=2, seed=1,
        catch_failures=True)
    assert "4oqu" in res and "garbage" not in res
    failed = out + "/failed_inferences/garbage.txt"
    assert os.path.exists(failed)
    assert "garbage.pdb" in open(failed).read()

    # without the catcher, the same input raises
    with pytest.raises(Exception):
        design_structures([str(bad)], random_ckpt, str(tmp_path / "fc2"),
                          samples_per_structure=1, batch_structures=1, seed=1)


def test_failure_raise_retires_parse_worker(random_ckpt, tmp_path):
    """When an invalid input aborts the run, the parse-ahead thread must
    exit (not stay blocked on the bounded queue) even with many inputs
    still unparsed."""
    import threading
    import time

    from na_mpnn_tpu.eval.batch_design import design_structures

    bad = tmp_path / "garbage.pdb"
    bad.write_text("not a pdb\n")
    # bad first, then enough valid inputs to overfill the parse queue
    paths = [str(bad)] + [f"{EXAMPLES}/4oqu.pdb"] * 40
    with pytest.raises(Exception):
        design_structures(paths, random_ckpt, str(tmp_path / "out"),
                          samples_per_structure=1, batch_structures=4, seed=1)

    def worker_alive():
        return any(t.name == "na-mpnn-parse-ahead" and t.is_alive()
                   for t in threading.enumerate())

    deadline = time.time() + 15
    while worker_alive() and time.time() < deadline:
        time.sleep(0.1)
    assert not worker_alive()


def test_batch_design_cli(random_ckpt, tmp_path):
    import pandas as pd
    from na_mpnn_tpu.eval.batch_design import main

    csv = tmp_path / "structs.csv"
    pd.DataFrame({"structure_path": [f"{EXAMPLES}/4oqu.pdb"]}).to_csv(
        csv, index=False)
    out = str(tmp_path / "cli_out")
    main(["--csv", str(csv), "--checkpoint", random_ckpt,
          "--out_folder", out, "--samples", "1", "--seed", "3",
          "--batch_structures", "2"])
    assert os.path.exists(out + "/seqs/4oqu.fa")
