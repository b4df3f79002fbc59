"""Inference on mmCIF inputs: the same structure written as PDB and as
mmCIF must produce identical parse_pdb feature dicts (the reference's
inference parser is PDB-format only, reference inference/data_utils.py:84;
read_cif_atoms extends the contract to mmCIF)."""
import gzip

import numpy as np

from na_mpnn_tpu import constants
from na_mpnn_tpu.data.pdb import parse_pdb, read_cif_atoms, read_pdb_atoms

PROTEIN_RES = ["GLY", "ALA", "SER", "LEU"]
DNA_RES = ["DA", "DC", "DG", "DT"]


def _make_atoms(L_protein=10, L_dna=8, seed=0):
    """(name, resname, chain, resnum, xyz) records, protein chain A + DNA
    chain B, coordinates rounded to the PDB format's 3 decimals so both
    text formats carry identical values."""
    rng = np.random.RandomState(seed)
    recs = []
    pos = np.zeros(3)
    for i in range(L_protein):
        pos = pos + rng.randn(3) * 1.5 + np.array([3.8, 0, 0])
        for name in constants.PROTEIN_BACKBONE_ATOMS:
            xyz = np.round(pos + rng.randn(3) * 0.8, 3)
            recs.append((name, PROTEIN_RES[i % 4], "A", i + 1, xyz))
    pos = np.array([0.0, 15.0, 0.0])
    for i in range(L_dna):
        pos = pos + rng.randn(3) * 1.5 + np.array([4.5, 0, 0])
        for name in constants.DNA_BACKBONE_ATOMS:
            xyz = np.round(pos + rng.randn(3) * 1.0, 3)
            recs.append((name, DNA_RES[i % 4], "B", i + 1, xyz))
    return recs


def _element(name):
    return name.strip("'0123456789")[0]


def _write_pdb(path, recs):
    lines = []
    for serial, (name, res, chain, num, xyz) in enumerate(recs, 1):
        nm = name if len(name) == 4 else " " + name
        lines.append(
            f"ATOM  {serial:>5} {nm:<4} {res:>3} {chain}{num:>4}    "
            f"{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}  1.00 10.00          "
            f"{_element(name):>2}")
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(path)


def _write_cif(path, recs):
    head = """data_SYN
#
loop_
_atom_site.group_PDB
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.label_alt_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.B_iso_or_equiv
_atom_site.pdbx_PDB_model_num
"""
    rows = []
    for name, res, chain, num, xyz in recs:
        nm = f'"{name}"' if "'" in name else name
        rows.append(f"ATOM {_element(name)} {nm} {res} {chain} {num} ? . "
                    f"{xyz[0]:.3f} {xyz[1]:.3f} {xyz[2]:.3f} 1.00 10.00 1")
    text = head + "\n".join(rows) + "\n"
    if str(path).endswith(".gz"):
        with gzip.open(path, "wt") as f:
            f.write(text)
    else:
        with open(path, "w") as f:
            f.write(text)
    return str(path)


def test_cif_atoms_match_pdb_atoms(tmp_path):
    recs = _make_atoms()
    pdb = _write_pdb(tmp_path / "s.pdb", recs)
    cif = _write_cif(tmp_path / "s.cif", recs)
    a_pdb = read_pdb_atoms(pdb, use_native=False)
    a_cif = read_cif_atoms(cif)
    assert len(a_pdb) == len(a_cif) == len(recs)
    for a, b in zip(a_pdb, a_cif):
        for f in ("record", "name", "resname", "chain", "resnum", "icode",
                  "occupancy", "bfactor", "element"):
            assert getattr(a, f) == getattr(b, f), (f, a, b)
        np.testing.assert_array_equal(a.xyz, b.xyz)


def test_parse_pdb_on_cif_matches_pdb(tmp_path):
    """Full inference parse parity across formats (plus .cif.gz)."""
    recs = _make_atoms(seed=3)
    pdb = _write_pdb(tmp_path / "s.pdb", recs)
    p_ref = parse_pdb(pdb)
    for cif_name in ("s.cif", "s.cif.gz"):
        p_cif = parse_pdb(_write_cif(tmp_path / cif_name, recs))
        for k, v in p_ref.items():
            if isinstance(v, np.ndarray):
                np.testing.assert_array_equal(
                    v, np.asarray(p_cif[k]), err_msg=k)
        assert p_cif["chain_letters"] == p_ref["chain_letters"]
        assert p_cif["na_chain_letters"] == p_ref["na_chain_letters"]


def test_cif_null_tokens_and_multichar_chains(tmp_path):
    """mmCIF '.'/'?' null markers fall back across numbering/chain/element
    schemes instead of being taken literally, and multi-character auth
    chain IDs survive."""
    text = """data_X
#
loop_
_atom_site.group_PDB
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.label_asym_id
_atom_site.auth_seq_id
_atom_site.label_seq_id
_atom_site.label_alt_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.B_iso_or_equiv
ATOM C CA GLY . B . 5 . 1.0 2.0 3.0 1.0 10.0
ATOM ? "C1'" DA AA X 7 7 . 4.0 5.0 6.0 1.0 10.0
"""
    p = tmp_path / "n.cif"
    p.write_text(text)
    atoms = read_cif_atoms(str(p))
    assert len(atoms) == 2
    # null auth_seq_id / auth_asym_id fall back to the label scheme
    assert atoms[0].resnum == 5 and atoms[0].chain == "B"
    # null type_symbol falls back to the atom-name element convention
    assert atoms[0].element == "C"
    # multi-character auth chain IDs are kept verbatim
    assert atoms[1].chain == "AA" and atoms[1].resnum == 7
    assert atoms[1].element == "C"


def test_cif_without_atom_site_raises_value_error(tmp_path):
    p = tmp_path / "comp.cif"
    p.write_text("data_PX4\n_chem_comp.id PX4\n")
    try:
        read_cif_atoms(str(p))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "atom_site" in str(e)


def test_uppercase_and_mmcif_extensions(tmp_path):
    recs = _make_atoms(seed=2)
    ref = parse_pdb(_write_pdb(tmp_path / "s.pdb", recs))
    for name in ("S.CIF", "s.mmcif"):
        got = parse_pdb(_write_cif(tmp_path / name, recs))
        np.testing.assert_array_equal(np.asarray(got["S"]),
                                      np.asarray(ref["S"]))
    from na_mpnn_tpu.data.seq_format import structure_name
    assert structure_name("/a/S.CIF") == "S"
    assert structure_name("/a/s.mmcif.gz") == "s"


def test_design_cli_accepts_cif(tmp_path):
    """The inference CLI runs end-to-end on an mmCIF input."""
    import jax

    from na_mpnn_tpu.models import ModelConfig, init_params
    from na_mpnn_tpu.train.checkpoint import save_checkpoint_npz
    from na_mpnn_tpu.cli.run import apply_mode_defaults, build_argparser, main

    cif = _write_cif(tmp_path / "s.cif", _make_atoms(seed=5))
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint_npz(ckpt, init_params(jax.random.PRNGKey(0),
                                          ModelConfig()), meta={"step": 0})
    out = str(tmp_path / "out")
    args = build_argparser().parse_args([
        "--mode", "design", "--checkpoint_na_mpnn", ckpt,
        "--pdb_path", cif, "--out_folder", out, "--seed", "7",
        "--batch_size", "1"])
    main(apply_mode_defaults(args))
    fa = open(out + "/seqs/s.fa").read()
    assert fa.startswith(">s,")
