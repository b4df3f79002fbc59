"""Evaluation-set preparation (eval/prepare_sets.py) and split release
writers (data/splits.py) — the reference's prepare_evaluation_sets.ipynb /
prepare_splits_for_release.ipynb equivalents."""
import json
import os

import numpy as np
import pandas as pd
import pytest

EXAMPLES = "/root/reference/inference/examples"


@pytest.fixture()
def mini_df(tmp_path):
    """Four entries: RNA monomer (4oqu), protein-DNA (1am9), one outside the
    split clusters, one too long."""
    side = tmp_path / "side"
    os.makedirs(side)

    def lengths_npy(name, L):
        p = str(side / f"{name}_lengths.npy")
        np.save(p, {"1": (L, 0, 0, L)}, allow_pickle=True)
        return p

    def sequences_csv(name, chain_types):
        p = str(side / f"{name}_seqs.csv")
        pd.DataFrame({"chain_type": chain_types,
                      "sequence": ["A" * 5] * len(chain_types)}).to_csv(
            p, index=False)
        return p

    rows = [
        {"id": "4oqu", "structure_path": f"{EXAMPLES}/4oqu.pdb",
         "dataset_name": "rcsb_cif_na",
         "nucleic_acid_chain_cluster_ids": "['na1']",
         "protein_chain_cluster_ids": "[]",
         "nucleic_acid_chain_cluster_ids_chain_types": "['polyribonucleotide']",
         "protein_chain_cluster_ids_chain_types": "[]",
         "asmb_lengths_path": lengths_npy("4oqu", 97),
         "sequences_path": sequences_csv("4oqu", ["polyribonucleotide"]),
         "ppm_paths": "[]"},
        {"id": "1am9", "structure_path": f"{EXAMPLES}/1am9.pdb",
         "dataset_name": "rcsb_cif_na",
         "nucleic_acid_chain_cluster_ids": "['na2']",
         "protein_chain_cluster_ids": "['p1']",
         "nucleic_acid_chain_cluster_ids_chain_types": "['polydeoxyribonucleotide']",
         "protein_chain_cluster_ids_chain_types": "['polypeptide(L)']",
         "asmb_lengths_path": lengths_npy("1am9", 389),
         "sequences_path": sequences_csv(
             "1am9", ["polypeptide(L)", "polydeoxyribonucleotide",
                      "polydeoxyribonucleotide"]),
         "ppm_paths": "[['/x/jaspar/MA0001.1.txt', '/x/H11MO/T1.txt']]"},
        {"id": "leak", "structure_path": f"{EXAMPLES}/4oqu.pdb",
         "dataset_name": "rcsb_cif_na",
         "nucleic_acid_chain_cluster_ids": "['na1', 'OTHER']",
         "protein_chain_cluster_ids": "[]",
         "nucleic_acid_chain_cluster_ids_chain_types": "['polyribonucleotide']",
         "protein_chain_cluster_ids_chain_types": "[]",
         "asmb_lengths_path": lengths_npy("leak", 97),
         "sequences_path": sequences_csv("leak", ["polyribonucleotide"]),
         "ppm_paths": "[]"},
        {"id": "long", "structure_path": f"{EXAMPLES}/4oqu.pdb",
         "dataset_name": "rf2na_distillation_cis_bp",
         "nucleic_acid_chain_cluster_ids": "['na3']",
         "protein_chain_cluster_ids": "['p2']",
         "nucleic_acid_chain_cluster_ids_chain_types": "['polydeoxyribonucleotide']",
         "protein_chain_cluster_ids_chain_types": "['polypeptide(L)']",
         "asmb_lengths_path": lengths_npy("long", 5000),
         "sequences_path": sequences_csv(
             "long", ["polypeptide(L)", "polydeoxyribonucleotide"]),
         "ppm_paths": "[['/x/cisbp/M001.txt']]"},
    ]
    return pd.DataFrame(rows)


def test_subset_helpers(mini_df):
    from na_mpnn_tpu.eval.prepare_sets import (
        get_entries_in_same_clusters_as_specified_entries,
        get_exclusive_cluster_subset, get_length_subset,
        get_polymer_type_statistics, get_ppm_statistics, get_ppm_subset,
        get_rna_monomer_subset)

    sub = get_exclusive_cluster_subset(
        mini_df, "nucleic_acid_chain_cluster_ids", {"na1", "na2", "na3"})
    assert set(sub["id"]) == {"4oqu", "1am9", "long"}  # 'leak' has OTHER

    sub = get_length_subset(mini_df, max_length=1000, min_length=20)
    assert set(sub["id"]) == {"4oqu", "1am9", "leak"}

    sub = get_rna_monomer_subset(mini_df)
    assert set(sub["id"]) == {"4oqu", "leak"}

    sub = get_ppm_subset(mini_df)
    assert set(sub["id"]) == {"1am9", "long"}

    sub = get_entries_in_same_clusters_as_specified_entries(
        mini_df, ["4oqu"], "nucleic_acid_chain_cluster_ids")
    assert set(sub["id"]) == {"4oqu"}  # 'leak' also needs OTHER
    with pytest.raises(KeyError):  # missing anchor fails loudly
        get_entries_in_same_clusters_as_specified_entries(
            mini_df, ["absent"], "nucleic_acid_chain_cluster_ids")

    stats = get_polymer_type_statistics(mini_df)
    assert stats["rna"] == 2 and stats["protein_dna"] == 2
    ppm_stats = get_ppm_statistics(mini_df)
    assert ppm_stats == {"total": 4, "ppm": 2, "ppm_from_crystal": 1,
                         "ppm_from_distillation": 1}


def test_rna_solo_paths(tmp_path):
    from na_mpnn_tpu.eval.prepare_sets import load_rna_solo_paths

    rfam, bgsu = tmp_path / "rfam", tmp_path / "bgsu"
    for d, fam in [(rfam, "rfam"), (bgsu, "bgsu")]:
        os.makedirs(d / "x")
        for pdb_id in ("4oqu", "1vc5"):
            (d / "x" / f"{pdb_id}_1_{fam}.pdb").write_text("END\n")
    (rfam / "x" / "PDB_00001abc_2.pdb").write_text("END\n")

    paths = load_rna_solo_paths(str(rfam), str(bgsu))
    assert "rfam" in os.path.basename(paths["4oqu"][0])      # RFAM first
    assert "bgsu" in os.path.basename(paths["1vc5"][0])      # quirk: flipped
    assert "1abc" in paths                                   # PDB_0000 prefix


def test_convert_and_prepare_design_set(mini_df, tmp_path):
    from na_mpnn_tpu.data.pdb import parse_pdb
    from na_mpnn_tpu.eval.prepare_sets import (convert_structures,
                                               prepare_design_set)

    out = convert_structures(mini_df.iloc[:2], str(tmp_path / "pdbs"))
    assert set(out["id"]) == {"4oqu", "1am9"}
    # the copies reparse with the right residue counts
    assert len(parse_pdb(out.iloc[0]["structure_path"])["S"]) == 97
    assert len(parse_pdb(out.iloc[1]["structure_path"])["S"]) == 389
    assert out.iloc[0]["original_structure_path"].endswith("4oqu.pdb")

    # the full driver: cluster subset -> rna-monomer -> length -> convert
    csv_in = str(tmp_path / "ds.csv")
    mini_df.to_csv(csv_in, index=False)
    clusters = tmp_path / "clusters.txt"
    clusters.write_text("na1\nna2\nna3\n")
    df = prepare_design_set(csv_in, str(clusters), str(tmp_path / "mono"),
                            str(tmp_path / "mono.csv"), subset="rna_monomer")
    assert list(df["id"]) == ["4oqu"]
    assert os.path.exists(tmp_path / "mono" / "4oqu.pdb")
    assert os.path.exists(tmp_path / "mono.csv")


def test_split_release_writers(mini_df, tmp_path):
    from na_mpnn_tpu.data.splits import (copy_distillation_structures,
                                         load_design_split,
                                         load_specificity_split,
                                         ppm_source_from_path,
                                         subset_df_to_remove_transfac,
                                         subset_evaluation_set_to_outputs,
                                         write_design_split,
                                         write_specificity_split)

    p = str(tmp_path / "design_test.json")
    write_design_split(p, mini_df)
    assert load_design_split(p) == ["4oqu", "1am9", "leak", "long"]

    p = str(tmp_path / "specificity_test.json")
    write_specificity_split(p, mini_df[mini_df["id"].isin(["1am9", "long"])])
    entries = load_specificity_split(p)
    assert entries[0][0] == "1am9"
    # (source, id) encoding with source inferred from path + dataset
    raw = json.load(open(p))
    assert raw[0][1][0][0] == ["JASPAR", "MA0001.1"]
    assert raw[0][1][0][1] == ["HOCOMOCO", "T1"]
    assert raw[1][1][0][0] == ["CIS-BP", "M001"]

    assert ppm_source_from_path("/a/jaspar/x.txt", "rcsb_cif_na") == "JASPAR"
    with pytest.raises(ValueError):
        ppm_source_from_path("/a/unknown/x.txt", "rcsb_cif_na")
    with pytest.raises(ValueError):  # TRANSFAC must be removed, not relabeled
        ppm_source_from_path("/a/x.txt", "rf2na_distillation_transfac")

    transfac = mini_df.copy()
    transfac.loc[transfac["id"] == "long", "dataset_name"] = \
        "rf2na_distillation_transfac"
    assert "long" not in set(subset_df_to_remove_transfac(transfac)["id"])

    outputs = pd.DataFrame({"structure_path": [f"{EXAMPLES}/1am9.pdb"]})
    sub = subset_evaluation_set_to_outputs(mini_df, outputs)
    assert set(sub["id"]) == {"1am9"}

    copied = copy_distillation_structures(mini_df, str(tmp_path / "distill"))
    assert len(copied) == 1 and copied[0].endswith("4oqu.pdb")
