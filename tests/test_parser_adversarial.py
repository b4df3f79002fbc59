"""Adversarial parser corpus: synthetic PDBs engineered around the spots
where a hand-written parser and the hand-written ProDy shim are most likely
to co-diverge from the reference semantics (VERDICT r3 item 6) — altloc-B-only
residues, insertion codes, nonstandard amino acids (MSE/SEC/PTR/SEP),
modified nucleotides that ProDy does NOT flag as nucleic (PSU/5MC/7MG),
hybrid protein+NA chains, multi-MODEL files, duplicate resnums, >26 chains,
zero occupancy, and missing element columns.

Every structure runs through BOTH the reference inference parser (verbatim,
/root/reference/inference/data_utils.py:84-405, on tests/prody_shim) and
na_mpnn_tpu.data.pdb.parse_pdb, exact-compared tensor by tensor with the
same contract as tests/test_parser_parity.py.
"""
import os
import sys

import numpy as np
import pytest

import prody_shim
from ref_oracle import REFERENCE_DIR, load_ref_module

from na_mpnn_tpu.data.pdb import parse_pdb

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_DIR, "inference")),
    reason="reference not available")


@pytest.fixture(scope="module")
def ref_parse_pdb():
    sys.modules["prody"] = prody_shim
    try:
        mod = load_ref_module("inference/data_utils.py",
                              "ref_inference_data_utils_adv")
    finally:
        del sys.modules["prody"]
    return mod.parse_PDB


# ---------------------------------------------------------------------------
# Synthetic PDB builder
# ---------------------------------------------------------------------------

_PROTEIN_ATOMS = [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O")]
_RNA_ATOMS = [("P", "P"), ("OP1", "O"), ("OP2", "O"), ("O5'", "O"),
              ("C5'", "C"), ("C4'", "C"), ("O4'", "O"), ("C3'", "C"),
              ("O3'", "O"), ("C2'", "C"), ("O2'", "O"), ("C1'", "C")]
_DNA_ATOMS = [(n, e) for n, e in _RNA_ATOMS if n != "O2'"]


def _atom_line(record, serial, name, altloc, resname, chain, resnum, icode,
               xyz, occ=1.0, bfac=0.0, element=None, element_col=True):
    if len(name) < 4:
        name_f = " " + name.ljust(3)
    else:
        name_f = name
    el = (element if element is not None
          else next(c for c in name if c.isalpha()))
    el_field = f"{el:>2}" if element_col else "  "
    return (f"{record:<6}{serial:>5} {name_f}{altloc}{resname:>3} {chain}"
            f"{resnum:>4}{icode}   {xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}"
            f"{occ:6.2f}{bfac:6.2f}          {el_field}")


class PDBBuilder:
    """Emit residues with deterministic, spread-out coordinates."""

    def __init__(self):
        self.lines = []
        self.serial = 1
        self.n_res = 0

    def residue(self, resname, chain, resnum, icode=" ", kind="protein",
                altloc=" ", occ=1.0, drop_atoms=(), element_col=True,
                record="ATOM", jitter=0.0):
        atoms = {"protein": _PROTEIN_ATOMS, "rna": _RNA_ATOMS,
                 "dna": _DNA_ATOMS}[kind]
        base = np.array([4.0 * self.n_res, 1.5 * (self.n_res % 7),
                         2.0 * (self.n_res % 5)], float)
        self.n_res += 1
        for j, (name, el) in enumerate(atoms):
            if name in drop_atoms:
                continue
            xyz = base + np.array([0.45 * j, 0.3 * (j % 3), 0.25 * (j % 4)])
            xyz = xyz + jitter
            self.lines.append(_atom_line(
                record, self.serial, name, altloc, resname, chain, resnum,
                icode, xyz, occ=occ, element=el, element_col=element_col))
            self.serial += 1

    def het_atom(self, name, element, resname, chain, resnum, xyz, occ=1.0):
        self.lines.append(_atom_line(
            "HETATM", self.serial, name, " ", resname, chain, resnum, " ",
            np.asarray(xyz, float), occ=occ, element=element))
        self.serial += 1

    def raw(self, line):
        self.lines.append(line)

    def write(self, path):
        with open(path, "w") as f:
            f.write("\n".join(self.lines) + "\nEND\n")
        return path


# ---------------------------------------------------------------------------
# Comparison (same contract as test_parser_parity)
# ---------------------------------------------------------------------------

TENSOR_KEYS = [
    "X", "X_m", "mask", "Y", "Y_t", "Y_m", "R_idx", "chain_labels",
    "protein_mask", "dna_mask", "rna_mask", "rna_mask_for_token_conversion",
    "R_polymer_type", "S", "xyz_65", "xyz_65_m",
]


def _compare(pdb_path, ref_parse_pdb, na_shared_tokens=True, **kw):
    pdb_path = str(pdb_path)
    ref_out, _bb, _other, ref_icodes, _water = ref_parse_pdb(
        pdb_path, model_type="na_mpnn", na_shared_tokens=na_shared_tokens,
        **kw)
    mine = parse_pdb(pdb_path, na_shared_tokens=na_shared_tokens, **kw)
    for key in TENSOR_KEYS:
        ref_arr = ref_out[key].cpu().numpy()
        my_arr = np.asarray(mine[key])
        assert my_arr.shape == ref_arr.shape, (key, my_arr.shape,
                                               ref_arr.shape)
        np.testing.assert_array_equal(
            my_arr.astype(np.float64), ref_arr.astype(np.float64),
            err_msg=key)
    assert mine["chain_letters"] == list(ref_out["chain_letters"])
    assert list(mine["na_chain_letters"]) == list(ref_out["na_chain_letters"])
    assert mine["chain_list"] == ref_out["chain_list"]
    np.testing.assert_array_equal(np.asarray(mine["icodes"]),
                                  np.asarray(ref_icodes))
    return mine


# ---------------------------------------------------------------------------
# Corpus
# ---------------------------------------------------------------------------

def test_altloc_b_only_residues(tmp_path, ref_parse_pdb):
    """A residue whose atoms exist only at altloc B must vanish entirely
    (ProDy keeps altloc ' '/'A' only); a residue with A+B keeps the A copy."""
    b = PDBBuilder()
    b.residue("ALA", "A", 1)
    b.residue("GLY", "A", 2, altloc="B")            # B-only: dropped
    b.residue("SER", "A", 3, altloc="A")            # A copy kept
    b.residue("SER", "A", 3, altloc="B", jitter=9.0)  # B copy dropped
    b.residue("VAL", "A", 4)
    out = _compare(b.write(tmp_path / "altloc.pdb"), ref_parse_pdb)
    assert len(out["resnames"]) == 3  # GLY never appears


def test_insertion_codes(tmp_path, ref_parse_pdb):
    """100 / 100A / 100B are three distinct residues; R_idx repeats 100."""
    b = PDBBuilder()
    b.residue("ALA", "A", 100)
    b.residue("GLY", "A", 100, icode="A")
    b.residue("SER", "A", 100, icode="B")
    b.residue("VAL", "A", 101)
    out = _compare(b.write(tmp_path / "icodes.pdb"), ref_parse_pdb)
    assert list(out["R_idx"]) == [100, 100, 100, 101]


def test_nonstandard_amino_acids(tmp_path, ref_parse_pdb):
    """MSE/SEC/SEP/TPO/PTR/CSO are ProDy-protein: parsed as polymer residues
    with UNK tokens (not in the 21-restype table)."""
    b = PDBBuilder()
    for i, rn in enumerate(["MET", "MSE", "SEC", "SEP", "TPO", "PTR", "CSO"]):
        b.residue(rn, "A", i + 1)
    out = _compare(b.write(tmp_path / "nonstd.pdb"), ref_parse_pdb)
    assert int(out["protein_mask"].sum()) == 7


def test_modified_nucleotides_are_context(tmp_path, ref_parse_pdb):
    """PSU/5MC/7MG are NOT in ProDy's nucleic flag set: their heavy atoms
    must land in the ligand context (Y), not the polymer."""
    b = PDBBuilder()
    b.residue("A", "A", 1, kind="rna")
    b.residue("PSU", "A", 2, kind="rna")
    b.residue("5MC", "A", 3, kind="rna")
    b.residue("7MG", "A", 4, kind="rna")
    b.residue("G", "A", 5, kind="rna")
    out = _compare(b.write(tmp_path / "modnt.pdb"), ref_parse_pdb)
    assert len(out["resnames"]) == 2          # only A and G are polymer
    assert out["Y"].shape[0] == 3 * len(_RNA_ATOMS)


def test_hybrid_chain(tmp_path, ref_parse_pdb):
    """Protein and DNA residues sharing one chain ID."""
    b = PDBBuilder()
    b.residue("ALA", "A", 1)
    b.residue("DT", "A", 2, kind="dna")
    b.residue("GLY", "A", 3)
    b.residue("DA", "A", 4, kind="dna")
    b.residue("U", "B", 1, kind="rna")
    out = _compare(b.write(tmp_path / "hybrid.pdb"), ref_parse_pdb)
    assert list(out["protein_mask"]) == [1, 0, 1, 0, 0]
    assert list(out["dna_mask"]) == [0, 1, 0, 1, 0]
    assert list(out["rna_mask"]) == [0, 0, 0, 0, 1]


def test_multi_model_first_only(tmp_path, ref_parse_pdb):
    """Only MODEL 1 is read; MODEL 2 carries shifted coords + extra residues."""
    b = PDBBuilder()
    b.raw("MODEL        1")
    b.residue("ALA", "A", 1)
    b.residue("GLY", "A", 2)
    b.raw("ENDMDL")
    b.raw("MODEL        2")
    b.residue("ALA", "A", 1, jitter=50.0)
    b.residue("GLY", "A", 2, jitter=50.0)
    b.residue("SER", "A", 3, jitter=50.0)
    b.raw("ENDMDL")
    out = _compare(b.write(tmp_path / "models.pdb"), ref_parse_pdb)
    assert len(out["resnames"]) == 2


def test_duplicate_resnums(tmp_path, ref_parse_pdb):
    """Two residues with the same (chain, resnum, icode) key.

    The REFERENCE parser cannot handle this input at all: it keys residues
    by the string "chain_resnum_icode" (inference/data_utils.py:120-128), so
    the duplicate collapses in its dict while the enumeration keeps
    counting, and get_aligned_coordinates indexes out of bounds
    (inference/data_utils.py:76). We document that crash as the reference
    behavior; our parser dedupes on the same key and parses the file
    (strictly more robust, identical residue identity rule)."""
    b = PDBBuilder()
    b.residue("ALA", "A", 7)
    b.residue("GLY", "A", 7, jitter=8.0)   # duplicate key
    b.residue("SER", "A", 8)
    p = b.write(tmp_path / "dup.pdb")
    with pytest.raises(IndexError):
        ref_parse_pdb(str(p), model_type="na_mpnn", na_shared_tokens=True)
    out = parse_pdb(str(p))
    assert list(out["R_idx"]) == [7, 8]    # duplicate key deduped
    assert out["resnames"] == ["ALA", "SER"]


def test_many_chains(tmp_path, ref_parse_pdb):
    """36 chains (A-Z then 0-9): chain_labels must follow first-appearance
    order, chain_list sorted lexicographically."""
    b = PDBBuilder()
    ids = [chr(ord("A") + i) for i in range(26)] + [str(d) for d in range(10)]
    for i, cid in enumerate(ids):
        b.residue("ALA", cid, i + 1)
    out = _compare(b.write(tmp_path / "chains.pdb"), ref_parse_pdb)
    assert len(out["chain_list"]) == 36


def test_zero_occupancy_and_missing_elements(tmp_path, ref_parse_pdb):
    b = PDBBuilder()
    b.residue("ALA", "A", 1, occ=0.0)                 # occupancy 0
    b.residue("GLY", "A", 2, occ=0.37)
    b.residue("SER", "A", 3, element_col=False)       # element from name
    _compare(b.write(tmp_path / "occ.pdb"), ref_parse_pdb)


def test_negative_resnums(tmp_path, ref_parse_pdb):
    b = PDBBuilder()
    b.residue("ALA", "A", -3)
    b.residue("GLY", "A", -2)
    b.residue("SER", "A", 0)
    out = _compare(b.write(tmp_path / "neg.pdb"), ref_parse_pdb)
    assert list(out["R_idx"]) == [-3, -2, 0]


def test_ligands_waters_and_hydrogens(tmp_path, ref_parse_pdb):
    """MG ion + SAM-like het with hydrogens: H atoms filtered out of Y;
    waters excluded entirely."""
    b = PDBBuilder()
    b.residue("ALA", "A", 1)
    b.residue("GLY", "A", 2)
    b.het_atom("MG", "MG", "MG", "B", 101, [1.0, 2.0, 3.0])
    b.het_atom("C1", "C", "LIG", "B", 102, [2.0, 2.0, 3.0])
    b.het_atom("H1", "H", "LIG", "B", 102, [2.5, 2.0, 3.0])
    b.het_atom("N1", "N", "LIG", "B", 102, [3.0, 2.0, 3.0])
    b.het_atom("O", "O", "HOH", "W", 201, [9.0, 9.0, 9.0])
    out = _compare(b.write(tmp_path / "lig.pdb"), ref_parse_pdb)
    assert out["Y"].shape[0] == 3          # MG, C1, N1 (H dropped)


def test_missing_backbone_atoms_partial_mask(tmp_path, ref_parse_pdb):
    """Residues missing backbone atoms get mask 0 but still occupy a row
    (they have a CA / C1')."""
    b = PDBBuilder()
    b.residue("ALA", "A", 1)
    b.residue("GLY", "A", 2, drop_atoms=("O",))
    b.residue("U", "B", 1, kind="rna", drop_atoms=("OP1",))
    b.residue("A", "B", 2, kind="rna", drop_atoms=("O2'",))  # -> DNA mask
    out = _compare(b.write(tmp_path / "partial.pdb"), ref_parse_pdb)
    assert list(out["mask"]) == [1, 0, 0, 1]
    assert list(out["dna_mask"]) == [0, 0, 0, 1]   # RNA minus O2' == DNA set


def test_chain_subset_and_na_only_flags(tmp_path, ref_parse_pdb):
    b = PDBBuilder()
    b.residue("ALA", "A", 1)
    b.residue("U", "B", 1, kind="rna")
    b.residue("DT", "C", 1, kind="dna")
    p = b.write(tmp_path / "flags.pdb")
    _compare(p, ref_parse_pdb, chains=["B", "C"])
    _compare(p, ref_parse_pdb, parse_na_only=True)
    _compare(p, ref_parse_pdb, na_shared_tokens=False)
    _compare(p, ref_parse_pdb, load_residues_with_missing_atoms=1)
