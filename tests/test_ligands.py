"""Ligand residue library (chem_comp parsing, leaving groups, automorphisms)
and ligand/composite-assembly round-trip through the training CIF parser."""
import textwrap

import numpy as np

from na_mpnn_tpu.data.cif import CIFParser, parse_operation_expression
from na_mpnn_tpu.data.ligands import (ResidueLibrary, build_residue,
                                      find_automorphisms, parse_chem_comp_cif)

# A phosphate-like chem_comp: P bonded to O1..O3 (equivalent) and O4 which
# carries a leaving H-analog group (modeled as leaving O4B bonded to O4).
PO4_CIF = textwrap.dedent("""\
    data_PX4
    #
    _chem_comp.id PX4
    _chem_comp.name "test phosphate"
    #
    loop_
    _chem_comp_atom.comp_id
    _chem_comp_atom.atom_id
    _chem_comp_atom.type_symbol
    _chem_comp_atom.charge
    _chem_comp_atom.pdbx_align
    _chem_comp_atom.pdbx_aromatic_flag
    _chem_comp_atom.pdbx_leaving_atom_flag
    _chem_comp_atom.pdbx_stereo_config
    _chem_comp_atom.model_Cartn_x
    _chem_comp_atom.model_Cartn_y
    _chem_comp_atom.model_Cartn_z
    PX4 P  P 0 1 N N N 0.0 0.0 0.0
    PX4 O1 O -1 1 N N N 1.5 0.0 0.0
    PX4 O2 O -1 1 N N N -1.5 0.0 0.0
    PX4 O3 O 0 1 N N N 0.0 1.5 0.0
    PX4 O4 O 0 1 N N N 0.0 -1.5 0.0
    PX4 O4B O 0 1 N Y N 0.0 -3.0 0.0
    #
    loop_
    _chem_comp_bond.comp_id
    _chem_comp_bond.atom_id_1
    _chem_comp_bond.atom_id_2
    _chem_comp_bond.value_order
    _chem_comp_bond.pdbx_aromatic_flag
    PX4 P O1 SING N
    PX4 P O2 SING N
    PX4 P O3 DOUB N
    PX4 P O4 SING N
    PX4 O4 O4B SING N
    """)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_parse_chem_comp_cif(tmp_path):
    raw = parse_chem_comp_cif(_write(tmp_path, "PX4.cif", PO4_CIF))
    assert raw["name"] == "PX4"
    assert len(raw["atoms"]) == 6
    assert len(raw["bonds"]) == 5
    o4b = [a for a in raw["atoms"] if a["atom_id"] == "O4B"][0]
    assert o4b["leaving"] is True
    o1 = [a for a in raw["atoms"] if a["atom_id"] == "O1"][0]
    assert o1["charge"] == -1
    p = [b for b in raw["bonds"] if b["b"] == "O3"][0]
    assert p["order"] == 2


def test_build_residue_leaving_groups_and_parents(tmp_path):
    res = build_residue(parse_chem_comp_cif(_write(tmp_path, "PX4.cif", PO4_CIF)))
    # O4's leaving neighbor O4B (and nothing else) is its leaving group
    assert res.atoms["O4"].leaving_group == ["O4B"]
    assert res.atoms["P"].leaving_group == []
    assert res.atoms["O1"].parent == "P"
    assert res.atoms["O4B"].parent == "O4"
    # O3 is a double-bond end but P has the >=3 heavy degree
    assert "P" in res.planars
    assert res.chirals == []


def test_automorphisms_swap_equivalent_oxygens(tmp_path):
    res = build_residue(parse_chem_comp_cif(_write(tmp_path, "PX4.cif", PO4_CIF)))
    autos = np.asarray(res.automorphisms)
    # columns: only atoms with alternative mappings; O1/O2/O3/O4 are
    # graph-equivalent singly-bonded oxygens except O4 (has O4B neighbor)
    assert autos.shape[0] >= 2
    assert "P" not in autos[0]                 # P never permutes
    id_row = autos[0].tolist()
    assert any(row.tolist() != id_row for row in autos[1:])
    # no mapping may involve the leaving atom O4B
    assert not any("O4B" in row for row in autos.tolist())


def test_find_automorphisms_filters_identity_only():
    # linear C-O-N: no symmetry -> no retained columns
    out = find_automorphisms(["C", "O", "N"], ["C", "O", "N"],
                             [("C", "O"), ("O", "N")])
    assert out == []


def test_residue_library_lazy_and_json_roundtrip(tmp_path):
    _write(tmp_path, "PX4.cif", PO4_CIF)
    lib = ResidueLibrary(cif_dir=str(tmp_path))
    assert "PX4" in lib and "ZZZ" not in lib
    res = lib.get("PX4")
    assert res is not None and res.name == "PX4"
    assert lib.get("PX4") is res              # cached
    json_path = str(tmp_path / "ligands.json.gz")
    lib.save_json(json_path)
    lib2 = ResidueLibrary(json_path=json_path)
    assert lib2.get("PX4").atoms["O4"].leaving_group == ["O4B"]
    lib3 = ResidueLibrary(json_path=json_path, skip_res=["PX4"])
    assert lib3.get("PX4") is None


LIGAND_STRUCTURE_CIF = textwrap.dedent("""\
    data_test
    #
    _exptl.method "X-RAY DIFFRACTION"
    #
    loop_
    _entity_poly.entity_id
    _entity_poly.type
    _entity_poly.pdbx_seq_one_letter_code_can
    1 polypeptide(L) GA
    #
    loop_
    _pdbx_poly_seq_scheme.asym_id
    _pdbx_poly_seq_scheme.entity_id
    _pdbx_poly_seq_scheme.seq_id
    A 1 1
    A 1 2
    #
    loop_
    _pdbx_struct_assembly.id
    _pdbx_struct_assembly.details
    1 author_defined_assembly
    #
    loop_
    _pdbx_struct_assembly_gen.assembly_id
    _pdbx_struct_assembly_gen.oper_expression
    _pdbx_struct_assembly_gen.asym_id_list
    1 (1)(2,3)(4) A,B
    #
    loop_
    _pdbx_struct_oper_list.id
    _pdbx_struct_oper_list.matrix[1][1]
    _pdbx_struct_oper_list.matrix[1][2]
    _pdbx_struct_oper_list.matrix[1][3]
    _pdbx_struct_oper_list.vector[1]
    _pdbx_struct_oper_list.matrix[2][1]
    _pdbx_struct_oper_list.matrix[2][2]
    _pdbx_struct_oper_list.matrix[2][3]
    _pdbx_struct_oper_list.vector[2]
    _pdbx_struct_oper_list.matrix[3][1]
    _pdbx_struct_oper_list.matrix[3][2]
    _pdbx_struct_oper_list.matrix[3][3]
    _pdbx_struct_oper_list.vector[3]
    1 1 0 0 0   0 1 0 0   0 0 1 0
    2 1 0 0 5   0 1 0 0   0 0 1 0
    3 1 0 0 0   0 1 0 5   0 0 1 0
    4 1 0 0 0   0 1 0 0   0 0 1 5
    #
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
    ATOM   N N  GLY A 1 1 . 0.0 0.0 0.0 1.0 10.0
    ATOM   C CA GLY A 1 1 . 1.4 0.0 0.0 1.0 10.0
    ATOM   C C  GLY A 1 1 . 2.1 1.2 0.0 1.0 10.0
    ATOM   O O  GLY A 1 1 . 1.6 2.3 0.0 1.0 10.0
    ATOM   N N  ALA A 2 2 . 3.4 1.2 0.0 1.0 10.0
    ATOM   C CA ALA A 2 2 . 4.2 2.4 0.0 1.0 10.0
    ATOM   C C  ALA A 2 2 . 5.6 2.0 0.0 1.0 10.0
    ATOM   O O  ALA A 2 2 . 6.0 0.9 0.0 1.0 10.0
    HETATM P P  PX4 B . 9 . 8.0 8.0 8.0 1.0 20.0
    HETATM O O1 PX4 B . 9 . 9.5 8.0 8.0 1.0 20.0
    HETATM O O2 PX4 B . 9 . 6.5 8.0 8.0 1.0 20.0
    HETATM O O3 PX4 B . 9 . 8.0 9.5 8.0 1.0 20.0
    HETATM O O4 PX4 B . 9 . 8.0 6.5 8.0 1.0 20.0
    """)


def test_cif_ligand_and_composite_assembly_roundtrip(tmp_path):
    """A structure CIF with a ligand chain and a 3-group composite operator
    expression parses fully: every operator product is expanded (the round-1
    parser silently truncated >2 groups) and the ligand residue resolves
    through the library."""
    _write(tmp_path, "PX4.cif", PO4_CIF)
    struct = _write(tmp_path, "test.cif", LIGAND_STRUCTURE_CIF)
    lib = ResidueLibrary(cif_dir=str(tmp_path))
    parser = CIFParser(residue_library=lib)
    chains, asmb, covale, meta = parser.parse(struct)

    assert chains["A"].type == "polypeptide(L)"
    assert chains["B"].type == "nonpoly"
    assert len(chains["B"].atoms) == 5

    # (1)(2,3)(4): 1*2*1 = 2 operator products per chain, 2 chains
    assert len(asmb["1"]) == 4
    xforms = [x for cid, x in asmb["1"] if cid == "A"]
    assert len(xforms) == 2
    expected = np.eye(4)
    expected[0, 3], expected[1, 3], expected[2, 3] = 5, 0, 5
    assert any(np.allclose(x, expected) for x in xforms)

    ligands = parser.ligand_residues(chains)
    assert ("B", "9", "PX4") in ligands
    assert ligands[("B", "9", "PX4")].atoms["O1"].parent == "P"


def test_parse_operation_expression_forms():
    assert parse_operation_expression("1-4") == ["1", "2", "3", "4"]
    assert parse_operation_expression("(1,2,5)") == ["1", "2", "5"]
    assert parse_operation_expression("P,X0") == ["P", "X0"]
    assert parse_operation_expression(" 1-2,7 ") == ["1", "2", "7"]


def test_save_all_roundtrip(tmp_path):
    """save_all writes ATOM/HETATM + TER + CONECT records that the PDB
    reader can re-parse (role of reference CIFParser.save/save_all,
    cifutils.py:821-880)."""
    from na_mpnn_tpu.data.cif import save_all, save_chain
    from na_mpnn_tpu.data.pdb import read_pdb_atoms

    struct = _write(tmp_path, "test.cif", LIGAND_STRUCTURE_CIF)
    parser = CIFParser()
    chains, asmb, covale, meta = parser.parse(struct)

    out = str(tmp_path / "out.pdb")
    first_atom = next(iter(chains["A"].atoms))
    first_lig = next(iter(chains["B"].atoms))
    save_all(chains, [(first_atom, first_lig)], out)
    text = open(out).read()
    assert "TER" in text and "CONECT" in text and "HETATM" in text

    atoms = read_pdb_atoms(out, use_native=False)
    n_in = sum(len(c.atoms) for c in chains.values())
    assert len(atoms) == n_in
    assert {a.chain for a in atoms} == {"A", "B"}

    single = str(tmp_path / "single.pdb")
    save_chain(chains["A"], single)
    assert len(read_pdb_atoms(single, use_native=False)) == len(chains["A"].atoms)


def test_automorphisms_respect_charge_and_bond_order(tmp_path):
    """O3 (P=O double bond, charge 0) must not swap with O1/O2 (single bond,
    charge -1) — element-only matching would wrongly permute them (OpenBabel
    symmetry classes carry charge + bond order)."""
    res = build_residue(parse_chem_comp_cif(_write(tmp_path, "PX4.cif", PO4_CIF)))
    autos = np.asarray(res.automorphisms)
    assert autos.shape[0] == 2          # identity + O1<->O2 only
    assert not any("O3" in row for row in autos.tolist())
    swapped = [row for row in autos.tolist() if row != autos[0].tolist()]
    assert swapped and set(swapped[0]) == {"O1", "O2"}


# ---------------------------------------------------------------------------
# Molecule topology + featurization (reference obutils.py:159-413)
# ---------------------------------------------------------------------------

def _atom(name, sym, xyz, charge=0, stereo="N"):
    return {"atom_id": name, "symbol": sym, "charge": charge, "leaving": False,
            "align": 0, "stereo": stereo, "aromatic": False, "xyz": list(xyz)}


def _bond(a, b, order=1, aromatic=False):
    return {"a": a, "b": b, "order": order, "aromatic": aromatic}


def test_get_topology_counts_and_lengths(tmp_path):
    from na_mpnn_tpu.data.ligands import get_topology
    raw = parse_chem_comp_cif(_write(tmp_path, "PX4.cif", PO4_CIF))
    topo = get_topology(raw)
    assert topo["bonds"].shape == (5, 2)
    # P at origin, O1 at (1.5,0,0): measured equilibrium length
    assert np.isclose(topo["bondlen"][0], 1.5)
    # angles: C(4,2)=6 at P + 1 at O4; dihedrals: O{1,2,3}-P-O4-O4B
    assert topo["angles"].shape == (7, 3)
    assert topo["dihedrals"].shape == (3, 4)


def test_bondlen_falls_back_to_covalent_radii():
    from na_mpnn_tpu.data.ligands import get_topology
    raw = {"name": "XX", "atoms": [_atom("C1", "C", [np.nan] * 3),
                                   _atom("C2", "C", [np.nan] * 3)],
           "bonds": [_bond("C1", "C2", 2)]}
    topo = get_topology(raw)
    assert np.isclose(topo["bondlen"][0], 2 * 0.75 * 0.87)


def test_chiral_quadruples_oriented_positive():
    from na_mpnn_tpu.data.ligands import chiral_quadruples
    # R-configured center with 3 heavy substituents at unit axes
    raw = {"name": "CHI",
           "atoms": [_atom("CA", "C", [0, 0, 0], stereo="R"),
                     _atom("N", "N", [1, 0, 0]),
                     _atom("O", "O", [0, 1, 0]),
                     _atom("F", "F", [0, 0, 1]),
                     _atom("H", "H", [-0.6, -0.6, -0.6])],
           "bonds": [_bond("CA", "N"), _bond("CA", "O"), _bond("CA", "F"),
                     _bond("CA", "H")]}
    quads = chiral_quadruples(raw)
    assert quads.shape == (1, 4) and quads[0, 0] == 0
    xyz = np.asarray([a["xyz"] for a in raw["atoms"]], float)
    v = xyz[quads[0, 1:]] - xyz[quads[0, 0]]
    assert np.dot(v[0], np.cross(v[1], v[2])) > 0
    # a mirrored molecule still yields positively-oriented quadruples
    for a in raw["atoms"]:
        a["xyz"][2] = -a["xyz"][2]
    quads_m = chiral_quadruples(raw)
    xyz = np.asarray([a["xyz"] for a in raw["atoms"]], float)
    v = xyz[quads_m[0, 1:]] - xyz[quads_m[0, 0]]
    assert np.dot(v[0], np.cross(v[1], v[2])) > 0


def test_planar_quadruples_guanidinium():
    from na_mpnn_tpu.data.ligands import planar_quadruples
    raw = {"name": "GAI",
           "atoms": [_atom("C", "C", [0, 0, 0], charge=1),
                     _atom("N1", "N", [1.3, 0, 0]),
                     _atom("N2", "N", [-0.65, 1.1, 0]),
                     _atom("N3", "N", [-0.65, -1.1, 0])],
           "bonds": [_bond("C", "N1", 2), _bond("C", "N2"), _bond("C", "N3")]}
    quads = planar_quadruples(raw)
    assert quads.shape == (1, 4) and quads[0, 0] == 0
    assert set(quads[0, 1:]) == {1, 2, 3}


def _benzene():
    atoms, bonds = [], []
    for i in range(6):
        ang = np.pi * i / 3
        atoms.append(_atom(f"C{i+1}", "C",
                           [1.39 * np.cos(ang), 1.39 * np.sin(ang), 0.0]))
    for i in range(6):
        bonds.append(_bond(f"C{i+1}", f"C{(i+1) % 6 + 1}", 1, aromatic=True))
    return {"name": "BNZ", "atoms": atoms, "bonds": bonds}


def test_featurizer_1d_2d_benzene_and_px4(tmp_path):
    from na_mpnn_tpu.data.ligands import MolFeaturizer
    feat = MolFeaturizer()
    raw = parse_chem_comp_cif(_write(tmp_path, "PX4.cif", PO4_CIF))
    f1d = feat.features_1d(raw)
    # P: Z=15, q=0, no H, sp2 (one double bond); O1: Z=8, q=-1, sp3
    assert f1d[0].tolist() == [15, 0, 0, 2]
    assert f1d[1].tolist() == [8, -1, 0, 3]

    benz = _benzene()
    f2d = feat.features_2d(benz, one_hot=False)
    assert f2d[0, 1].tolist() == [1, 1, 1, 1]     # aromatic, in-ring, order, sep
    assert f2d[0, 3, 3] == 3                      # para separation
    assert f2d[0, 0, 3] == 0
    oh = feat.features_2d(benz)
    assert oh.shape == (6, 6, feat.num_features_2d())
    assert oh.sum(-1).min() == 4                  # every pair fully encoded
    # acyclic bond is not in-ring
    chain = {"name": "ETH", "atoms": [_atom("C1", "C", [0, 0, 0]),
                                      _atom("C2", "C", [1.5, 0, 0])],
             "bonds": [_bond("C1", "C2")]}
    assert feat.features_2d(chain, one_hot=False)[0, 1, 1] == 0


def test_electron_configuration_aufbau():
    from na_mpnn_tpu.data.ligands import electron_configuration
    c = electron_configuration(6)
    assert c.sum() == 6 and c[:6].tolist() == [1, 1, 1, 1, 1, 1]
    assert electron_configuration(26).sum() == 26  # Fe fills 4s before 3d


def test_embed_features_1d_dims():
    from na_mpnn_tpu.data.ligands import MolFeaturizer
    feat = MolFeaturizer()
    benz = _benzene()
    emb = feat.embed_features_1d(benz)
    assert emb.shape == (6, feat.num_features_1d())
    assert emb[0, :6].sum() == 6                  # carbon econf


def test_reduce_hydrogens_methane():
    from na_mpnn_tpu.data.ligands import MolFeaturizer
    feat = MolFeaturizer()
    atoms = [_atom("C", "C", [0, 0, 0])]
    bonds = []
    for i, d in enumerate(np.eye(3).tolist() + [[-1, -1, -1]]):
        atoms.append(_atom(f"H{i+1}", "H", d))
        bonds.append(_bond("C", f"H{i+1}"))
    raw = {"name": "CH4", "atoms": atoms, "bonds": bonds}
    f1d = feat.features_1d(raw)
    assert f1d[0].tolist() == [6, 0, 4, 3]
    red = feat.reduce_hydrogens(raw, f1d=f1d, f2d=feat.features_2d(raw))
    assert red["xyz"].shape == (1, feat.maxhydr + 1, 3)
    assert np.isfinite(red["xyz"][0, :5]).all()
    assert np.isnan(red["xyz"][0, 5:]).all()
    assert red["ijk"].shape == (5, 3)
    assert red["ijk"][:, 2].tolist() == [0, 1, 2, 3, 4]   # sorted by full idx
    assert red["observed"].all() and red["heavy"].tolist() == [True] + [False] * 4
    assert red["f1d"].shape == (1, 4) and red["f2d"].shape == (1, 1, feat.num_features_2d())


SDF_ETHANOLAMINE = """ethanolamine
  test

  4  3  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.5000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    2.1000    1.3000    0.0000 N   0  0  0  0  0  0  0  0  0  0  0  0
   -0.6000   -1.2000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  2  3  1  0
  1  4  1  0
M  CHG  1   3   1
M  END
$$$$
"""


def test_parse_sdf_and_featurize():
    from na_mpnn_tpu.data.ligands import MolFeaturizer, get_topology, parse_sdf
    mols = parse_sdf(SDF_ETHANOLAMINE)
    assert len(mols) == 1
    raw = mols[0]
    assert raw["name"] == "ethanolamine"
    assert len(raw["atoms"]) == 4 and len(raw["bonds"]) == 3
    assert raw["atoms"][2]["charge"] == 1                 # M CHG applied
    topo = get_topology(raw)
    assert topo["bonds"].shape == (3, 2)
    assert np.isclose(topo["bondlen"][0], 1.5)
    f1d = MolFeaturizer().features_1d(raw)
    assert f1d[:, 0].tolist() == [6, 6, 7, 8]


def test_standard_residue_library():
    """The packaged residue-library artifact (role of the reference's
    ligands.json.gz, cifutils.py:130): all 28 standard residues load, with
    the chemically-expected symmetry/stereo/leaving properties, and the
    topology/featurizer entry points run on the entries."""
    from na_mpnn_tpu.data.ligands import (MolFeaturizer, ResidueLibrary,
                                          get_topology)

    lib = ResidueLibrary.standard()
    names = list("ACGU") + ["DA", "DC", "DG", "DT"] + [
        "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
        "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL"]
    for n in names:
        assert n in lib, n
        assert lib.get(n) is not None, n

    # leaving groups: OXT caps amino acids, OP3 caps nucleotides
    assert lib.get("ALA").atoms["C"].leaving_group == ["OXT"]
    assert lib.get("DA").atoms["P"].leaving_group == ["OP3"]

    # ring-flip / methyl-swap automorphisms exist; quasi-symmetric
    # carboxylates (different bond orders) do not permute — same asymmetry
    # the reference's TODO leaves (obutils.py:14)
    phe = np.asarray(lib.get("PHE").automorphisms)
    assert phe.shape[0] == 2 and {"CD1", "CD2", "CE1", "CE2"} <= set(phe[0])
    assert np.asarray(lib.get("VAL").automorphisms).shape[0] == 2
    assert lib.get("ASP").automorphisms == []
    assert lib.get("ARG").automorphisms == []

    # stereo flags: L-amino acids are S at CA except CYS (R); GLY achiral
    assert lib.get("ALA").atoms["CA"].stereo == "S"
    assert lib.get("CYS").atoms["CA"].stereo == "R"
    assert lib.get("GLY").chirals == []
    assert lib.get("THR").atoms["CB"].stereo == "R"
    # ribose C2' is a stereocenter; deoxyribose C2' is not
    assert "C2'" in lib.get("A").chirals and "C2'" not in lib.get("DA").chirals

    # topology + featurizer run on raw entries
    raw = lib._raw["PRO"]
    topo = get_topology(raw)
    feat = MolFeaturizer()
    f2d = feat.features_2d(raw, one_hot=False)
    name_to_i = {a["atom_id"]: i for i, a in enumerate(raw["atoms"])}
    assert f2d[name_to_i["N"], name_to_i["CD"], 1] == 1      # ring bond
    assert f2d[name_to_i["C"], name_to_i["O"], 2] == 2       # double bond
    assert (topo["bondlen"] > 1.0).all()                     # radii fallback
    trp = lib._raw["TRP"]
    f2d_trp = feat.features_2d(trp, one_hot=False)
    nt = {a["atom_id"]: i for i, a in enumerate(trp["atoms"])}
    assert f2d_trp[nt["CD2"], nt["CE2"], 0] == 1             # aromatic fused bond
    f1d = feat.features_1d(lib._raw["HIS"])
    hyb = {a["atom_id"]: h for a, h in zip(lib._raw["HIS"]["atoms"], f1d[:, 3])}
    assert hyb["CG"] == 2 and hyb["CB"] == 3                 # sp2 ring, sp3 CB


# Synthetic structure exercising modified residues: an MSE-containing protein
# chain, a PSU-containing RNA chain, and a free 7MG nucleotide ligand — the
# residue classes the reference resolves through its CCD-wide ligands.json.gz
# (cifutils.py:130). All must resolve from the PACKAGED library (no cif_dir).
MODIFIED_STRUCTURE_CIF = textwrap.dedent("""\
    data_MODX
    #
    _exptl.method "X-RAY DIFFRACTION"
    #
    loop_
    _entity_poly.entity_id
    _entity_poly.type
    _entity_poly.pdbx_seq_one_letter_code_can
    1 polypeptide(L) GM
    2 polyribonucleotide AU
    #
    loop_
    _pdbx_poly_seq_scheme.asym_id
    _pdbx_poly_seq_scheme.entity_id
    _pdbx_poly_seq_scheme.seq_id
    A 1 1
    A 1 2
    B 2 1
    B 2 2
    #
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
    ATOM   N  N   GLY A 1 1 . 0.0 0.0 0.0 1.0 10.0
    ATOM   C  CA  GLY A 1 1 . 1.4 0.0 0.0 1.0 10.0
    ATOM   C  C   GLY A 1 1 . 2.1 1.2 0.0 1.0 10.0
    ATOM   O  O   GLY A 1 1 . 1.6 2.3 0.0 1.0 10.0
    HETATM N  N   MSE A 2 2 . 3.4 1.2 0.0 1.0 10.0
    HETATM C  CA  MSE A 2 2 . 4.2 2.4 0.0 1.0 10.0
    HETATM C  C   MSE A 2 2 . 5.6 2.0 0.0 1.0 10.0
    HETATM O  O   MSE A 2 2 . 6.0 0.9 0.0 1.0 10.0
    HETATM C  CB  MSE A 2 2 . 4.0 3.3 1.2 1.0 10.0
    HETATM C  CG  MSE A 2 2 . 4.6 4.7 1.1 1.0 10.0
    HETATM SE SE  MSE A 2 2 . 4.2 5.8 2.7 1.0 10.0
    HETATM C  CE  MSE A 2 2 . 5.3 7.4 2.3 1.0 10.0
    ATOM   P  P   A   B 1 5 . 10.0 0.0 0.0 1.0 12.0
    ATOM   C  C1' A   B 1 5 . 11.0 1.0 0.0 1.0 12.0
    ATOM   N  N9  A   B 1 5 . 12.0 2.0 0.0 1.0 12.0
    HETATM P  P   PSU B 2 6 . 13.0 3.0 0.0 1.0 12.0
    HETATM C  C1' PSU B 2 6 . 14.0 4.0 0.0 1.0 12.0
    HETATM C  C5  PSU B 2 6 . 15.0 5.0 0.0 1.0 12.0
    HETATM N  N1  PSU B 2 6 . 15.5 6.2 0.0 1.0 12.0
    HETATM P  P   7MG C . 9 . 20.0 0.0 0.0 1.0 20.0
    HETATM C  C1' 7MG C . 9 . 21.0 1.0 0.0 1.0 20.0
    HETATM N  N9  7MG C . 9 . 22.0 2.0 0.0 1.0 20.0
    HETATM N  N7  7MG C . 9 . 23.0 3.0 0.0 1.0 20.0
    HETATM C  CM7 7MG C . 9 . 24.0 4.0 0.0 1.0 20.0
    """)


def test_packaged_library_covers_modified_residues():
    """The packaged residue_library.json.gz carries the high-frequency
    modified amino acids and nucleotides (VERDICT r3 item 7; role of the
    reference's CCD-wide ligands.json.gz, cifutils.py:130), with exact
    heavy-atom topology."""
    from na_mpnn_tpu.data.ligands import MolFeaturizer, get_topology
    lib = ResidueLibrary.standard()
    modified = ["MSE", "SEC", "SEP", "TPO", "PTR", "CSO", "CSD", "CME",
                "HYP", "MLZ", "MLY", "M3L", "ALY", "KCX", "PCA", "FME",
                "PSU", "5MC", "5CM", "5MU", "1MA", "7MG", "2MG", "M2G",
                "OMC", "OMG", "H2U", "4SU", "BRU", "I", "DI", "DU"]
    for name in modified:
        res = lib.get(name)
        assert res is not None, name
        assert len(res.atoms) >= 7, name

    # element edits
    assert lib.get("MSE").atoms["SE"].element.upper() == "SE"
    assert lib.get("MSE").atoms["SE"].parent in ("CG", "CE")
    assert lib.get("SEC").atoms["SE"].element.upper() == "SE"
    assert lib.get("4SU").atoms["S4"].element.upper() == "S"
    assert lib.get("BRU").atoms["BR"].element.upper() == "BR"

    # phosphoamino acids: P carries three terminal oxygens off the hydroxyl
    for name, host in [("SEP", "OG"), ("TPO", "OG1"), ("PTR", "OH")]:
        res = lib.get(name)
        assert res.atoms["P"].parent in (host, "O1P", "O2P", "O3P"), name
        assert {"O1P", "O2P", "O3P"} <= set(res.atoms), name

    # pseudouridine is a C-glycoside: sugar bonds to C5, not N1
    psu_bonds = {frozenset((b.a, b.b)) for b in lib.get("PSU").bonds}
    assert frozenset(("C1'", "C5")) in psu_bonds
    assert frozenset(("C1'", "N1")) not in psu_bonds

    # dihydrouridine ring is saturated (no aromatic ring bonds)
    assert not any(b.aromatic for b in lib.get("H2U").bonds)

    # 7-methylguanosine: methyl on N7, formal + charge
    mg = lib.get("7MG")
    assert mg.atoms["CM7"].parent == "N7"
    assert mg.atoms["N7"].charge == 1

    # inosine = guanosine minus the exocyclic N2
    assert "N2" not in lib.get("I").atoms and "O6" in lib.get("I").atoms

    # pyroglutamate ring closure N-CD
    pca_bonds = {frozenset((b.a, b.b)) for b in lib.get("PCA").bonds}
    assert frozenset(("N", "CD")) in pca_bonds

    # topology + featurizer run on a modified entry
    raw = lib._raw["MSE"]
    topo = get_topology(raw)
    assert (topo["bondlen"] > 1.0).all()
    f1d = MolFeaturizer().features_1d(raw)
    assert f1d.shape[0] == len(raw["atoms"])


def test_cif_parse_with_modified_residues(tmp_path):
    """A structure containing MSE (protein), PSU (RNA) and a free 7MG ligand
    parses end-to-end with the packaged library: polymer chains keep their
    modified residues' atoms, and the ligand resolves with full topology."""
    struct = _write(tmp_path, "modx.cif", MODIFIED_STRUCTURE_CIF)
    parser = CIFParser(residue_library=ResidueLibrary.standard())
    chains, asmb, covale, meta = parser.parse(struct)

    assert chains["A"].type == "polypeptide(L)"
    assert chains["B"].type == "polyribonucleotide"
    assert chains["C"].type == "nonpoly"

    mse_atoms = {an for (_c, _n, rn, an) in chains["A"].atoms if rn == "MSE"}
    assert "SE" in mse_atoms
    psu_atoms = {an for (_c, _n, rn, an) in chains["B"].atoms if rn == "PSU"}
    assert psu_atoms >= {"C5", "N1"}

    ligands = parser.ligand_residues(chains)
    key = next(k for k in ligands if k[2] == "7MG")
    assert ligands[key].atoms["CM7"].parent == "N7"
