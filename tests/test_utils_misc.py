"""Tests for geometry utils, splits readers, curation, visualization."""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp


def test_geometry_parity_with_reference():
    """get_ang/get_dih vs the reference torch implementations
    (reference geometry.py:5-56)."""
    import torch
    from na_mpnn_tpu.utils.geometry import get_ang, get_dih, get_frames, triple_prod
    from ref_oracle import load_ref_module

    ref = load_ref_module("geometry.py", "ref_geometry")
    rng = np.random.RandomState(0)
    a, b, c, d = [rng.randn(16, 3).astype(np.float32) for _ in range(4)]
    ang = np.asarray(get_ang(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))
    ang_ref = ref.get_ang(torch.tensor(a), torch.tensor(b), torch.tensor(c)).numpy()
    np.testing.assert_allclose(ang, ang_ref, atol=1e-5)
    dih = np.asarray(get_dih(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                             jnp.asarray(d)))
    dih_ref = ref.get_dih(torch.tensor(a), torch.tensor(b), torch.tensor(c),
                          torch.tensor(d)).numpy()
    np.testing.assert_allclose(dih, dih_ref, atol=1e-5)
    fr = np.asarray(get_frames(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))
    # frames are orthonormal
    eye = np.einsum("bij,bkj->bik", fr, fr)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    tp = np.asarray(triple_prod(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))
    np.testing.assert_allclose(tp, np.sum(a * np.cross(b, c), -1), atol=1e-4)


def test_splits_readers(tmp_path):
    from na_mpnn_tpu.data.splits import (available_reference_splits,
                                         filter_dataframe_by_split,
                                         load_design_split,
                                         load_specificity_split)
    import pandas as pd

    dpath = tmp_path / "design_train.json"
    json.dump(["1abc", "2xyz"], open(dpath, "w"))
    assert load_design_split(str(dpath)) == ["1abc", "2xyz"]

    spath = tmp_path / "spec_train.json"
    json.dump([["1abc", ["M1", "M2"]], ["2xyz", []]], open(spath, "w"))
    assert load_specificity_split(str(spath)) == [("1abc", ["M1", "M2"]),
                                                  ("2xyz", [])]

    df = pd.DataFrame({"structure_path": ["/x/1abc.cif.gz", "/x/9zzz.pdb"]})
    sub = filter_dataframe_by_split(df, ["1ABC"])
    assert len(sub) == 1
    # reference split files load too
    ref_splits = available_reference_splits("/root/reference/splits")
    if ref_splits:
        ids = load_design_split(ref_splits["design_valid"])
        assert len(ids) > 1000


def test_curation_split_and_sampling():
    import pandas as pd
    from na_mpnn_tpu.data.curation import (compute_chain_cluster_degrees,
                                           compute_sampling_probability,
                                           train_valid_test_split)

    df = pd.DataFrame({
        "protein_chain_cluster_ids": [["p1"], ["p1"], ["p2"], ["p3"]],
        "nucleic_acid_chain_cluster_ids": [["n1"], ["n2"], ["n2"], ["n3"]],
    })
    deg_p = compute_chain_cluster_degrees(df, "protein_chain_cluster_ids")
    deg_n = compute_chain_cluster_degrees(df, "nucleic_acid_chain_cluster_ids")
    assert deg_p == {"p1": 2, "p2": 1, "p3": 1}
    df = compute_sampling_probability(df)
    # row 0: degrees [2 (p1), 1 (n1)] -> mean(1/3, 1/2)
    assert df["sampling_probability"][0] == pytest.approx((1 / 3 + 1 / 2) / 2)

    out = train_valid_test_split(df, deg_n, "nucleic_acid_chain_cluster_ids",
                                 valid_fraction=0.34, test_fraction=0.34,
                                 max_valid_test_cluster_degree=None, seed=1)
    assert set(out["split"]) <= {"train", "valid", "test"}
    # rows sharing a cluster get consistent assignment (n2 shared by rows 1,2)
    assert out["split"][1] == out["split"][2]


def test_cdhit_cluster_parser(tmp_path):
    from na_mpnn_tpu.data.curation import parse_cdhit_clusters
    clstr = tmp_path / "o.clstr"
    clstr.write_text(
        ">Cluster 0\n0\t10nt, >seqA... *\n1\t10nt, >seqB... at 95%\n"
        ">Cluster 1\n0\t8nt, >seqC... *\n")
    assert parse_cdhit_clusters(str(clstr)) == {"seqA": 0, "seqB": 0, "seqC": 1}


def test_visualize(tmp_path):
    from na_mpnn_tpu.eval.visualize import (aggregate_result_jsons,
                                            parse_training_log,
                                            plot_training_metrics,
                                            sequence_logo)
    log = tmp_path / "log.txt"
    log.write_text(
        "Epoch\tTrain\tValidation\n"
        "epoch: 1, step: 10, train_time: 1.0, valid_time: 0.5, "
        "train_loss: 3.100, train_accuracy: 0.100, valid_loss: 3.000, valid_accuracy: 0.120\n"
        "epoch: 2, step: 20, train_time: 1.0, valid_time: 0.5, "
        "train_loss: 2.900, train_accuracy: 0.150, valid_loss: 2.950, valid_accuracy: 0.140\n")
    df = parse_training_log(str(log))
    assert len(df) == 2 and df["train_loss"].iloc[1] == 2.9
    plot_training_metrics(str(log), out_path=str(tmp_path / "curves.png"))
    assert os.path.exists(tmp_path / "curves.png")

    rng = np.random.RandomState(0)
    ppm = rng.dirichlet(np.ones(4), size=10)
    sequence_logo(ppm, out_path=str(tmp_path / "logo.png"))
    assert os.path.exists(tmp_path / "logo.png")

    json.dump({"name": "a", "sequence_recovery": 0.5},
              open(tmp_path / "r1.json", "w"))
    json.dump({"name": "b", "sequence_recovery": 0.7},
              open(tmp_path / "r2.json", "w"))
    adf = aggregate_result_jsons(str(tmp_path / "r*.json"))
    assert len(adf) == 2 and adf["sequence_recovery"].mean() == pytest.approx(0.6)


def test_family_label_pipeline(tmp_path, monkeypatch):
    """InterProScan family-label stage (reference
    data/family_label_and_cluster.ipynb + family_label.sh) with the scanner
    subprocess mocked: gather -> shard -> per-shard TSV -> combined CSV with
    sequences mapped back from the temporary integer accessions."""
    import pandas as pd
    from na_mpnn_tpu.data import curation

    # two structures' sequences CSVs + a preprocessing_output.csv
    seqs1 = tmp_path / "s1.csv"
    pd.DataFrame({"chain_type": ["polypeptide(L)", "polyribonucleotide"],
                  "sequence": ["MKV", "ACGU"]}).to_csv(seqs1, index=False)
    seqs2 = tmp_path / "s2.csv"
    pd.DataFrame({"chain_type": ["polypeptide(L)"],
                  "sequence": ["GGAA"]}).to_csv(seqs2, index=False)
    pre = tmp_path / "preprocessing_output.csv"
    pd.DataFrame({"sequences_path": [str(seqs1), str(seqs2)]}).to_csv(
        pre, index=False)

    seqs = curation.gather_chain_sequences([str(pre)], ("polypeptide(L)",))
    assert seqs == ["GGAA", "MKV"]
    assert curation.gather_chain_sequences(
        [str(pre)], curation.NA_CHAIN_TYPES) == ["ACGU"]

    def fake_scan(fasta_path, output_path, applications="Pfam"):
        rows = []
        header = None
        for line in open(fasta_path):
            if line.startswith(">"):
                header = line[1:].strip()
            elif line.strip():
                rows.append(f"{header}\tmd5\t{len(line.strip())}\tPfam\t"
                            f"PF{header}\tdesc\t1\t3\t0.1\tT\td\tIPR\ti\tg\tp")
        with open(output_path, "w") as f:
            f.write("\n".join(rows))

    monkeypatch.setattr(curation, "run_interproscan", fake_scan)
    out = tmp_path / "fl"
    df = curation.family_label_pipeline([str(pre)], str(out), num_jobs=3)
    assert set(df["sequence"]) == {"GGAA", "MKV"}
    assert (out / "all_protein_family_labels.csv").exists()
    assert "protein_accession" not in df.columns
    assert list(df["signature_accession"]) == ["PF0", "PF1"]


def test_standardize_na_sequence():
    from na_mpnn_tpu.data.curation import standardize_na_sequence
    assert standardize_na_sequence("ACGU") == "ACGT"
    assert standardize_na_sequence("ACGTN?") == "ACGTXX"


def test_per_polymer_training_curves(tmp_path):
    from na_mpnn_tpu.eval.visualize import (plot_per_polymer_training_curves,
                                            running_mean)
    lines = []
    for e in range(6):
        step = 10 * (e + 1)
        parts = [f"epoch: {e+1}, step: {step}, train_time: 1.0, valid_time: 0.5"]
        for split in ("train", "valid"):
            for p in ("protein", "dna", "rna"):
                parts.append(f"{split}_{p}_accuracy: {0.1 + 0.01 * e:.3f}")
                parts.append(f"{split}_{p}_loss: {3.0 - 0.1 * e:.3f}")
        lines.append(", ".join(parts))
    log = tmp_path / "log.txt"
    log.write_text("\n".join(lines) + "\n")

    out = tmp_path / "curves.png"
    fig = plot_per_polymer_training_curves(str(log), smooth=2,
                                           out_path=str(out))
    assert out.exists()
    # both panels carry 6 series (3 polymers x train/valid)
    assert [len(ax.get_lines()) for ax in fig.axes] == [6, 6]
    np.testing.assert_allclose(running_mean([1, 2, 3, 4], 2), [1.5, 2.5, 3.5])


def test_seq_logo_comparison(tmp_path):
    from na_mpnn_tpu import constants
    from na_mpnn_tpu.eval.visualize import (
        load_predicted_ppm_and_true_sequence, plot_seq_logo_comparison)

    rng = np.random.RandomState(0)
    L, nl = 8, constants.NUM_LETTERS
    t2i = constants.restype_to_int_table(True)
    dna_cols = [t2i[r] for r in ("DA", "DC", "DG", "DT")]

    aligned = np.zeros((L, nl)); aligned[:, dna_cols] = rng.dirichlet(np.ones(4), L)
    pred = np.zeros((L, nl)); pred[:, dna_cols] = rng.dirichlet(np.ones(4), L)
    subject = {
        "predicted_ppm_na_mpnn_format": pred.tolist(),
        "true_sequence_na_mpnn_format": (t2i["DA"] + rng.randint(0, 4, L)).tolist(),
        "mask": [1] * L, "dna_mask": [1] * L,
        "chain_labels": [0] * (L // 2) + [1] * (L - L // 2),
    }
    subj_path = tmp_path / "subject.json"
    json.dump(subject, open(subj_path, "w"))
    score = {"aligned_ppm": aligned.tolist(), "ppm_mask": [1] * L,
             "subject_path": str(subj_path)}
    score_path = tmp_path / "score.json"
    json.dump(score, open(score_path, "w"))

    ref4, pred4, true_seq = load_predicted_ppm_and_true_sequence(
        str(score_path), num_chains_to_plot=1)
    assert ref4.shape == (L // 2, 4) and pred4.shape == (L // 2, 4)
    assert ((0 <= true_seq) & (true_seq < 4)).all()
    np.testing.assert_allclose(pred4.sum(-1), 1.0)

    out = tmp_path / "logo_cmp.png"
    fig = plot_seq_logo_comparison(str(score_path), num_chains_to_plot=2,
                                   out_path=str(out))
    assert out.exists() and len(fig.axes) == 2
