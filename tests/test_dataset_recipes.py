"""Per-source dataset CSV recipes + motif-format converters (reference
data/datasets/*/make_dataset_csv.ipynb)."""
import os

import numpy as np
import pandas as pd
import pytest

from na_mpnn_tpu.data import dataset_recipes as dr

JASPAR = """>MA0001.1 TEST
A  [  4 19  0 ]
C  [ 16  0 20 ]
G  [  0  1  0 ]
T  [  0  0  0 ]
"""

HOCOMOCO = """>TEST_MOTIF
10 0 0 10
0 20 0 0
"""

CISBP = """TF Name\tTEST
Motif\tM001

Pos\tA\tC\tG\tT
1\t0.7\t0.1\t0.1\t0.1
2\t0.25\t0.25\t0.25\t0.25
"""

TRANSFAC = """VV  TRANSFAC MATRIX TABLE
//
AC  V$TEST_01
XX
P0      A      C      G      T
01      1      0      0      3      W
02      0      4      0      0      C
XX
//
AC  V$OTHER_02
XX
P0      A      C      G      T
01      2      2      0      0      M
XX
//
"""


def test_jaspar_converter():
    ppm = dr.load_ppm_jaspar(JASPAR)
    assert ppm.shape == (3, 4)
    np.testing.assert_allclose(ppm.sum(1), 1.0)
    np.testing.assert_allclose(ppm[0], [0.2, 0.8, 0.0, 0.0])


def test_hocomoco_converter():
    ppm = dr.load_ppm_hocomoco(HOCOMOCO)
    np.testing.assert_allclose(ppm, [[0.5, 0, 0, 0.5], [0, 1, 0, 0]])


def test_cisbp_converter():
    ppm = dr.load_ppm_cisbp(CISBP)
    assert ppm.shape == (2, 4)
    np.testing.assert_allclose(ppm[0], [0.7, 0.1, 0.1, 0.1])


def test_transfac_converter():
    mats = dr.parse_transfac_matrices(TRANSFAC)
    assert set(mats) == {"V$TEST_01", "V$OTHER_02"}
    np.testing.assert_allclose(mats["V$TEST_01"],
                               [[0.25, 0, 0, 0.75], [0, 1, 0, 0]])
    np.testing.assert_allclose(mats["V$OTHER_02"], [[0.5, 0.5, 0, 0]])


def test_preprocess_ppm_directory(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "M001.jaspar").write_text(JASPAR)
    out = tmp_path / "ppms"
    dr.preprocess_ppm_directory(str(raw), str(out), "jaspar")
    df = pd.read_csv(out / "M001.csv")
    assert list(df.columns) == ["A", "C", "G", "T"]
    assert len(df) == 3


def test_rcsb_cif_na_recipe():
    scan = pd.DataFrame({
        "label": ["1abc", "2def", "3ghi", "4jkl"],
        "date": ["2001-01-01"] * 4,
        "num_heavy": [5000, 50, 5000, 5000],
        "coverage": [0.95, 0.95, 0.95, 0.95],
        "resolution": [2.0, 2.0, 2.0, np.nan],
        "poly_type": ["['polypeptide(L)', 'polyribonucleotide']",
                      "['polyribonucleotide']",
                      "['polypeptide(L)']",          # no NA -> dropped
                      "['polydeoxyribonucleotide']"],
        "poly_sequence": ["['MKV', 'ACGU']", "['ACGU']", "['MKV']",
                          "['ACGT']"],
        "poly": ["['A','B']"] * 4, "nonpoly": ["[]"] * 4,
    })
    out = dr.make_rcsb_cif_na_input(scan, "/db/cif")
    assert list(out["id"]) == ["1abc", "4jkl"]   # 2def: heavy, 3ghi: no NA
    assert out.iloc[0]["structure_path"] == "/db/cif/ab/1abc.cif.gz"
    assert list(out.columns) == ["id", "structure_path", "date",
                                 "dataset_name"]


def test_sequence_x_filter():
    assert dr.sequence_x_filter(["MKV", "ACGU"])
    assert dr.sequence_x_filter(["X" * 10])            # short chains pass
    assert not dr.sequence_x_filter(["X" * 50, "MKV"])
    assert dr.sequence_x_filter(["M" * 50 + "X" * 10])


def test_distillation_recipe():
    df = pd.DataFrame({
        "id": ["g1_ACGT", "g2_TTTT", "g3_CCCC"],
        "gene_id": ["g1", "g2", "g3"],
        "i_pae": [3.0, 9.0, 5.0],
        "plddt": [0.9, 0.9, 0.7],
    })
    out = dr.make_distillation_input(df, "/d", "rf2na_distillation_cis_bp",
                                     "gene_id")
    assert list(out["id"]) == ["g1_ACGT"]
    assert out.iloc[0]["structure_path"] == "/d/g1/g1_ACGT.pdb"
    assert out.iloc[0]["date"] == "1970-01-01"
    assert "gene_id" in out.columns


def test_build_preprocessing_output(tmp_path):
    pre = tmp_path / "preprocessed"
    for attr in ("lengths", "sequences"):
        (pre / attr).mkdir(parents=True)
    (pre / "bad").mkdir()
    (pre / "bad" / "s2.txt").write_text("parse error")
    for sid in ("s1", "s3"):
        (pre / "lengths" / f"{sid}.npy").write_bytes(b"x")
        (pre / "sequences" / f"{sid}.csv").write_text("chain_type,sequence\n")

    input_csv = tmp_path / "preprocessing_input.csv"
    pd.DataFrame({"id": ["s1", "s2", "s3"],
                  "structure_path": ["/a", "/b", "/c"],
                  "date": ["1970-01-01"] * 3,
                  "dataset_name": ["t"] * 3,
                  "gene_id": ["g1", "g2", "g3"]}).to_csv(input_csv, index=False)
    out_csv = tmp_path / "preprocessing_output.csv"
    df, reasons = dr.build_preprocessing_output(
        str(input_csv), str(pre), str(out_csv),
        id_to_ppm_paths={"g1": [["/p/x.csv"]]}, key_column="gene_id")
    assert list(df["id"]) == ["s1", "s3"]
    assert reasons == {"parse error": 1}
    assert df.iloc[0]["lengths_path"].endswith("lengths/s1.npy")
    assert df.iloc[0]["sequences_path"].endswith("sequences/s1.csv")
    assert df.iloc[0]["ppm_paths"] == [["/p/x.csv"]]
    assert "gene_id" not in df.columns
    assert os.path.exists(out_csv)
