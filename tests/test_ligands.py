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
