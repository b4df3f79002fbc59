"""Build the packaged standard-residue library artifact.

The reference ships a prebuilt ``ligands.json.gz`` residue library built from
the PDB chemical-component dictionary via OpenBabel (reference
cifutils.py:130 loads it; its contents are the parseLigand outputs for every
residue a parser may hit). This script writes the equivalent artifact for
the standard polymer residue set — the 20 amino acids and the 8 standard
nucleotides — as raw molecule dicts in the parse_chem_comp_cif shape, so
``ResidueLibrary(json_path=...)`` (and ``ResidueLibrary.standard()``) builds
leaving groups, automorphisms, chirals, planars, topology and features from
it with no chemistry toolkit and no CCD download.

Chemistry encoded per residue (heavy atoms only; matching the PDB CCD):
* atoms: element, formal charge (all standard residues are neutral in the
  CCD), CIP stereo flags for the standard stereocenters (CA = S except GLY
  none / CYS R; ILE CB = S, THR CB = R; sugar C1'/C3'/C4' = R/S/R, ribose
  C2' = R), leaving flags (OXT for amino acids; OP3 for nucleotides)
* bonds: order (Kekulé for rings) + aromatic flags (rings of PHE/TYR/TRP/
  HIS and the nucleobases)

Run:  python scripts/build_residue_library.py [out.json.gz]
Writes na_mpnn_tpu/data/residue_library.json.gz by default.
"""
import gzip
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(REPO, "na_mpnn_tpu", "data",
                           "residue_library.json.gz")

NAN3 = [None, None, None]  # JSON-safe; loader maps None -> NaN


def atom(name, sym, stereo="N", leaving=False, charge=0, aromatic=False):
    return {"atom_id": name, "symbol": sym, "charge": charge,
            "leaving": leaving, "align": 0, "stereo": stereo,
            "aromatic": aromatic, "xyz": NAN3}


def bond(a, b, order=1, aromatic=False):
    return {"a": a, "b": b, "order": order, "aromatic": aromatic}


def amino(name, side_atoms, side_bonds, stereo=None):
    """Amino-acid entry: backbone N-CA(-C(=O)(-OXT)) + side chain off CB.
    `stereo` maps atom->CIP flag; CA defaults to S."""
    stereo = dict(stereo or {})
    if name != "GLY":
        stereo.setdefault("CA", "R" if name == "CYS" else "S")
    atoms = [atom("N", "N"), atom("CA", "C", stereo=stereo.get("CA", "N")),
             atom("C", "C"), atom("O", "O"),
             atom("OXT", "O", leaving=True)]
    bonds = [bond("N", "CA"), bond("CA", "C"), bond("C", "O", 2),
             bond("C", "OXT")]
    for a in side_atoms:
        el = "S" if a.startswith("S") else ("O" if a.startswith("O") else
                                            ("N" if a.startswith("N") else "C"))
        atoms.append(atom(a, el, stereo=stereo.get(a, "N")))
    bonds.extend(side_bonds)
    return {"name": name, "atoms": atoms, "bonds": bonds}


def ring(names, aromatic=True, orders=None):
    """Closed ring bonds over `names` (Kekulé orders optional)."""
    orders = orders or [1] * len(names)
    return [bond(names[i], names[(i + 1) % len(names)], orders[i], aromatic)
            for i in range(len(names))]


AMINO_ACIDS = [
    amino("ALA", ["CB"], [bond("CA", "CB")]),
    amino("ARG", ["CB", "CG", "CD", "NE", "CZ", "NH1", "NH2"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "CD"),
           bond("CD", "NE"), bond("NE", "CZ"), bond("CZ", "NH1"),
           bond("CZ", "NH2", 2)]),
    amino("ASN", ["CB", "CG", "OD1", "ND2"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "OD1", 2),
           bond("CG", "ND2")]),
    amino("ASP", ["CB", "CG", "OD1", "OD2"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "OD1", 2),
           bond("CG", "OD2")]),
    amino("CYS", ["CB", "SG"], [bond("CA", "CB"), bond("CB", "SG")]),
    amino("GLN", ["CB", "CG", "CD", "OE1", "NE2"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "CD"),
           bond("CD", "OE1", 2), bond("CD", "NE2")]),
    amino("GLU", ["CB", "CG", "CD", "OE1", "OE2"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "CD"),
           bond("CD", "OE1", 2), bond("CD", "OE2")]),
    amino("GLY", [], []),
    amino("HIS", ["CB", "CG", "ND1", "CD2", "CE1", "NE2"],
          [bond("CA", "CB"), bond("CB", "CG")]
          + ring(["CG", "ND1", "CE1", "NE2", "CD2"],
                 orders=[1, 2, 1, 1, 2])),
    amino("ILE", ["CB", "CG1", "CG2", "CD1"],
          [bond("CA", "CB"), bond("CB", "CG1"), bond("CB", "CG2"),
           bond("CG1", "CD1")], stereo={"CB": "S"}),
    amino("LEU", ["CB", "CG", "CD1", "CD2"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "CD1"),
           bond("CG", "CD2")]),
    amino("LYS", ["CB", "CG", "CD", "CE", "NZ"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "CD"),
           bond("CD", "CE"), bond("CE", "NZ")]),
    amino("MET", ["CB", "CG", "SD", "CE"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "SD"),
           bond("SD", "CE")]),
    amino("PHE", ["CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ"],
          [bond("CA", "CB"), bond("CB", "CG")]
          + ring(["CG", "CD1", "CE1", "CZ", "CE2", "CD2"],
                 orders=[1, 2, 1, 2, 1, 2])),
    amino("PRO", ["CB", "CG", "CD"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "CD"),
           bond("CD", "N")]),
    amino("SER", ["CB", "OG"], [bond("CA", "CB"), bond("CB", "OG")]),
    amino("THR", ["CB", "OG1", "CG2"],
          [bond("CA", "CB"), bond("CB", "OG1"), bond("CB", "CG2")],
          stereo={"CB": "R"}),
    amino("TRP", ["CB", "CG", "CD1", "CD2", "NE1", "CE2", "CE3", "CZ2",
                  "CZ3", "CH2"],
          [bond("CA", "CB"), bond("CB", "CG"),
           # 5-ring (indole pyrrole): CG=CD1-NE1-CE2=CD2-CG
           bond("CG", "CD1", 2, True), bond("CD1", "NE1", 1, True),
           bond("NE1", "CE2", 1, True), bond("CE2", "CD2", 1, True),
           bond("CD2", "CG", 1, True)]
          + ring(["CD2", "CE3", "CZ3", "CH2", "CZ2", "CE2"],
                 orders=[2, 1, 2, 1, 2, 1])[:-1]),  # CE2-CD2 already bonded
    amino("TYR", ["CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ", "OH"],
          [bond("CA", "CB"), bond("CB", "CG"), bond("CZ", "OH")]
          + ring(["CG", "CD1", "CE1", "CZ", "CE2", "CD2"],
                 orders=[1, 2, 1, 2, 1, 2])),
    amino("VAL", ["CB", "CG1", "CG2"],
          [bond("CA", "CB"), bond("CB", "CG1"), bond("CB", "CG2")]),
]


def nucleotide(name, base_atoms, base_bonds, glyco_n, deoxy):
    """Nucleoside-5'-monophosphate entry (CCD form): OP3 is the leaving
    5'-phosphate cap; ribose carries O2', deoxyribose does not."""
    sugar_stereo = {"C1'": "R", "C3'": "S", "C4'": "R"}
    if not deoxy:
        sugar_stereo["C2'"] = "R"
    atoms = [atom("OP3", "O", leaving=True), atom("P", "P"),
             atom("OP1", "O"), atom("OP2", "O"), atom("O5'", "O"),
             atom("C5'", "C"), atom("C4'", "C", stereo=sugar_stereo["C4'"]),
             atom("O4'", "O"), atom("C3'", "C", stereo=sugar_stereo["C3'"]),
             atom("O3'", "O"),
             atom("C2'", "C", stereo=sugar_stereo.get("C2'", "N")),
             atom("C1'", "C", stereo=sugar_stereo["C1'"])]
    if not deoxy:
        atoms.append(atom("O2'", "O"))
    bonds = [bond("OP3", "P"), bond("P", "OP1", 2), bond("P", "OP2"),
             bond("P", "O5'"), bond("O5'", "C5'"), bond("C5'", "C4'"),
             bond("C4'", "O4'"), bond("C4'", "C3'"), bond("C3'", "O3'"),
             bond("C3'", "C2'"), bond("C2'", "C1'"), bond("C1'", "O4'")]
    if not deoxy:
        bonds.append(bond("C2'", "O2'"))
    for a in base_atoms:
        el = "O" if a.startswith("O") else ("N" if a.startswith("N") else "C")
        atoms.append(atom(a, el))
    bonds.extend(base_bonds)
    bonds.append(bond("C1'", glyco_n))
    return {"name": name, "atoms": atoms, "bonds": bonds}


def purine(kind):
    """Adenine ('A') / guanine ('G') base graph (CCD atom names)."""
    atoms = ["N9", "C8", "N7", "C5", "C6", "N1", "C2", "N3", "C4"]
    bonds = [bond("N9", "C8", 1, True), bond("C8", "N7", 2, True),
             bond("N7", "C5", 1, True), bond("C5", "C6", 1, True),
             bond("N1", "C2", 1, True), bond("N3", "C4", 2, True),
             bond("C4", "N9", 1, True), bond("C4", "C5", 2, True)]
    if kind == "A":
        atoms += ["N6"]
        bonds += [bond("C6", "N1", 2, True), bond("C2", "N3", 1, True),
                  bond("C6", "N6")]
    else:  # guanine
        atoms += ["O6", "N2"]
        bonds += [bond("C6", "N1", 1, True), bond("C2", "N3", 2, True),
                  bond("C6", "O6", 2), bond("C2", "N2")]
    return atoms, bonds


def pyrimidine(kind):
    """Cytosine ('C') / uracil ('U') / thymine ('T') base graph."""
    atoms = ["N1", "C2", "O2", "N3", "C4", "C5", "C6"]
    bonds = [bond("N1", "C2", 1, True), bond("C2", "O2", 2),
             bond("C5", "C6", 2, True), bond("C6", "N1", 1, True)]
    if kind == "C":
        atoms += ["N4"]
        bonds += [bond("C2", "N3", 1, True), bond("N3", "C4", 2, True),
                  bond("C4", "C5", 1, True), bond("C4", "N4")]
    else:  # uracil / thymine
        atoms += ["O4"]
        bonds += [bond("C2", "N3", 1, True), bond("N3", "C4", 1, True),
                  bond("C4", "C5", 1, True), bond("C4", "O4", 2)]
        if kind == "T":
            atoms += ["C7"]
            bonds += [bond("C5", "C7")]
    return atoms, bonds


def build_all():
    residues = {}
    for aa in AMINO_ACIDS:
        residues[aa["name"]] = aa
    for name, kind, deoxy in [("A", "A", False), ("G", "G", False),
                              ("C", "C", False), ("U", "U", False),
                              ("DA", "A", True), ("DG", "G", True),
                              ("DC", "C", True), ("DT", "T", True)]:
        if kind in ("A", "G"):
            base_atoms, base_bonds = purine(kind)
            glyco = "N9"
        else:
            base_atoms, base_bonds = pyrimidine(kind)
            glyco = "N1"
        residues[name] = nucleotide(name, base_atoms, base_bonds, glyco, deoxy)
    return residues


def main(out_path=DEFAULT_OUT):
    residues = build_all()
    with gzip.open(out_path, "wt") as f:
        json.dump(residues, f)
    print(f"wrote {len(residues)} residues to {out_path}")

    # smoke: load through the library and touch every entry
    sys.path.insert(0, REPO)
    from na_mpnn_tpu.data.ligands import ResidueLibrary
    lib = ResidueLibrary(json_path=out_path)
    for name in residues:
        res = lib.get(name)
        assert res is not None, name
        print(f"  {name}: {len(res.atoms)} atoms, {len(res.bonds)} bonds, "
              f"{len(res.automorphisms)} automorphism rows, "
              f"chirals={res.chirals}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT)
