"""Training-side mmCIF path: synthetic CIF structures (protein + DNA, with
quoted primed atom names, entity_poly typing, poly_seq mapping, deposition
metadata) drive the offline preprocessing CLI and NADataset.loader — the
same route real RCSB training data takes (reference cifutils.CIFParser ->
na_data_utils.PDBDataset.loader). The PDB-format twin of this test is
tests/test_training_e2e.py."""
import gzip
import json
import os

import numpy as np
import pytest

from na_mpnn_tpu import constants

PROTEIN_RES = [("GLY", "G"), ("ALA", "A"), ("SER", "S"), ("LEU", "L")]
DNA_RES = [("DA", "A"), ("DC", "C"), ("DG", "G"), ("DT", "T")]


def _cif_text(L_protein=12, L_dna=10, seed=0):
    rng = np.random.RandomState(seed)
    prot_seq = "".join(PROTEIN_RES[i % 4][1] for i in range(L_protein))
    dna_seq = "".join(DNA_RES[i % 4][1] for i in range(L_dna))
    head = f"""data_SYN
#
_exptl.method 'X-RAY DIFFRACTION'
_refine.ls_d_res_high 2.00
_pdbx_database_status.recvd_initial_deposition_date 2020-01-01
#
loop_
_entity_poly.entity_id
_entity_poly.type
_entity_poly.pdbx_seq_one_letter_code_can
1 polypeptide(L) {prot_seq}
2 polydeoxyribonucleotide {dna_seq}
#
loop_
_pdbx_poly_seq_scheme.asym_id
_pdbx_poly_seq_scheme.entity_id
_pdbx_poly_seq_scheme.seq_id
"""
    scheme = [f"A 1 {i + 1}" for i in range(L_protein)]
    scheme += [f"B 2 {i + 1}" for i in range(L_dna)]
    atom_head = """#
loop_
_atom_site.group_PDB
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_seq_id
_atom_site.auth_seq_id
_atom_site.label_alt_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.B_iso_or_equiv
_atom_site.pdbx_PDB_model_num
"""
    rows = []

    def atom_row(name, res, chain, num, xyz):
        el = name.strip("'0123456789")[0]
        nm = f'"{name}"' if "'" in name else name
        rows.append(f"ATOM {el} {nm} {res} {chain} {num} {num} . "
                    f"{xyz[0]:.3f} {xyz[1]:.3f} {xyz[2]:.3f} 1.00 10.00 1")

    pos = np.zeros(3)
    for i in range(L_protein):
        pos = pos + rng.randn(3) * 1.5 + np.array([3.8, 0, 0])
        res = PROTEIN_RES[i % 4][0]
        for name in constants.PROTEIN_BACKBONE_ATOMS:
            atom_row(name, res, "A", i + 1, pos + rng.randn(3) * 0.8)
    pos = np.array([0.0, 15.0, 0.0])
    for i in range(L_dna):
        pos = pos + rng.randn(3) * 1.5 + np.array([4.5, 0, 0])
        res = DNA_RES[i % 4][0]
        for name in constants.DNA_BACKBONE_ATOMS:
            atom_row(name, res, "B", i + 1, pos + rng.randn(3) * 1.0)
    return head + "\n".join(scheme) + "\n" + atom_head + "\n".join(rows) + "\n"


def _write_synthetic_cif(path, **kw):
    text = _cif_text(**kw)
    if str(path).endswith(".gz"):
        with gzip.open(path, "wt") as f:
            f.write(text)
    else:
        with open(path, "w") as f:
            f.write(text)
    return str(path)


@pytest.fixture(scope="module")
def cif_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cif_ds")
    paths = [
        _write_synthetic_cif(root / "s0.cif", seed=0),
        _write_synthetic_cif(root / "s1.cif.gz", seed=1),
    ]
    return {"root": str(root), "paths": paths}


def test_preprocess_cif_inputs(cif_corpus):
    """The preprocessing CLI consumes .cif and .cif.gz structures and writes
    the same side files as for PDBs (no bad/ entries)."""
    import pandas as pd

    from na_mpnn_tpu.cli.preprocess import main as preprocess_main

    root = cif_corpus["root"]
    csv_in = os.path.join(root, "input.csv")
    pd.DataFrame({"structure_path": cif_corpus["paths"]}).to_csv(
        csv_in, index=False)
    out_dir = os.path.join(root, "preprocessed")
    cfg_path = os.path.join(root, "pp.json")
    json.dump({"ATOMS_TO_LOAD": "backbone"}, open(cfg_path, "w"))
    preprocess_main([csv_in, out_dir, "1", "0", cfg_path])

    assert not os.listdir(os.path.join(out_dir, "bad"))
    lengths = np.load(os.path.join(out_dir, "asmb_lengths", "s0.npy"),
                      allow_pickle=True).item()
    macro_L, protein_L, dna_L, rna_L = lengths["1"]
    assert (macro_L, protein_L, dna_L, rna_L) == (22, 12, 10, 0)
    seq_csv = open(os.path.join(out_dir, "sequences", "s0.csv")).read()
    assert "polypeptide(L)" in seq_csv and "polydeoxyribonucleotide" in seq_csv


def test_dataset_loader_cif(cif_corpus):
    """NADataset.loader parses CIF structures end-to-end: chain typing from
    entity_poly, identity-assembly fallback, occupancy masks, and token
    assignment for both polymer classes (gz and plain)."""
    from na_mpnn_tpu.data.dataset import DatasetConfig, NADataset
    from na_mpnn_tpu.data.parsers import make_parsers

    cif, pdb = make_parsers()
    ds = NADataset(cif_parser=cif, pdb_parser=pdb,
                   config=DatasetConfig(batch_tokens=128))
    for path in cif_corpus["paths"]:
        out = ds.loader({"structure_path": path, "ppm_paths": "[]"}, "1")
        assert out is not None, path
        assert out["protein_L"] == 12 and out["dna_L"] == 10
        assert out["rna_L"] == 0 and out["macromolecule_L"] == 22
        assert out["X"].shape[0] == 22 and out["X"].shape[2] == 3
        assert out["S"].shape == (22,)
        # DNA rows carry NA tokens, protein rows protein tokens
        prot = out["protein_mask"] == 1
        assert prot.sum() == 12 and (out["dna_mask"] == 1).sum() == 10
        assert np.isfinite(out["X"][out["X_m"] == 1]).all()
