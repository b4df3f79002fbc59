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


def derive(parent, name, add_atoms=(), add_bonds=(), rename=(),
           set_element=(), set_charge=(), set_stereo=(), del_bonds=(),
           set_order=()):
    """Modified residue from its parent: copy + graph edits (the role the
    PDB CCD's _chem_comp.mon_nstd_parent_comp_id relationship plays).

    rename: (old, new, element) — renames the atom and every bond endpoint.
    set_order: ((a, b, order, aromatic), ...) — retype an existing bond.
    """
    import copy
    e = copy.deepcopy(parent)
    e["name"] = name
    for old, new, el in rename:
        for a in e["atoms"]:
            if a["atom_id"] == old:
                a["atom_id"], a["symbol"] = new, el
        for b in e["bonds"]:
            if b["a"] == old:
                b["a"] = new
            if b["b"] == old:
                b["b"] = new
    for aid, el in set_element:
        for a in e["atoms"]:
            if a["atom_id"] == aid:
                a["symbol"] = el
    for aid, q in set_charge:
        for a in e["atoms"]:
            if a["atom_id"] == aid:
                a["charge"] = q
    for aid, st in set_stereo:
        for a in e["atoms"]:
            if a["atom_id"] == aid:
                a["stereo"] = st
    for pair in del_bonds:
        e["bonds"] = [b for b in e["bonds"]
                      if {b["a"], b["b"]} != set(pair)]
    for a, b, order, arom in set_order:
        for bd in e["bonds"]:
            if {bd["a"], bd["b"]} == {a, b}:
                bd["order"], bd["aromatic"] = order, arom
    e["atoms"].extend(add_atoms)
    e["bonds"].extend(add_bonds)
    return e


def phosphate(host, prefix=("O1P", "O2P", "O3P")):
    """Phosphoamino-acid decoration: P + three terminal oxygens on `host`
    (CCD atom names for SEP/TPO/PTR)."""
    return ([atom("P", "P"), atom(prefix[0], "O"), atom(prefix[1], "O"),
             atom(prefix[2], "O")],
            [bond(host, "P"), bond("P", prefix[0], 2), bond("P", prefix[1]),
             bond("P", prefix[2])])


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


def hypoxanthine():
    """Inosine base: guanine minus the exocyclic N2."""
    atoms, bonds = purine("G")
    atoms = [a for a in atoms if a != "N2"]
    bonds = [b for b in bonds if "N2" not in (b["a"], b["b"])]
    return atoms, bonds


def modified_amino_acids(std):
    """Common modified amino acids (reference: the reference's packaged
    ligands.json.gz covers the full CCD, cifutils.py:130; this builds the
    high-frequency subset from parent-residue graph edits, with CCD heavy-
    atom names). Frequency-ranked set: MSE dominates (SeMet phasing), then
    the phospho-residues, oxidized/modified Cys, hydroxyproline, and the
    methylated/acylated lysines of histone structures."""
    P_SEP, B_SEP = phosphate("OG")
    P_TPO, B_TPO = phosphate("OG1")
    P_PTR, B_PTR = phosphate("OH")
    return [
        # selenomethionine / selenocysteine
        derive(std["MET"], "MSE", rename=[("SD", "SE", "SE")]),
        derive(std["CYS"], "SEC", rename=[("SG", "SE", "SE")]),
        # phospho-Ser/Thr/Tyr
        derive(std["SER"], "SEP", add_atoms=P_SEP, add_bonds=B_SEP),
        derive(std["THR"], "TPO", add_atoms=P_TPO, add_bonds=B_TPO),
        derive(std["TYR"], "PTR", add_atoms=P_PTR, add_bonds=B_PTR),
        # cysteine oxidation states
        derive(std["CYS"], "CSO", add_atoms=[atom("OD", "O")],
               add_bonds=[bond("SG", "OD")]),
        derive(std["CYS"], "CSD", add_atoms=[atom("OD1", "O"),
                                             atom("OD2", "O")],
               add_bonds=[bond("SG", "OD1", 2), bond("SG", "OD2")]),
        # S,S-(2-hydroxyethyl)thiocysteine (BME adduct)
        derive(std["CYS"], "CME",
               add_atoms=[atom("SD", "S"), atom("CE", "C"), atom("CZ", "C"),
                          atom("OH", "O")],
               add_bonds=[bond("SG", "SD"), bond("SD", "CE"),
                          bond("CE", "CZ"), bond("CZ", "OH")]),
        # 4-hydroxyproline
        derive(std["PRO"], "HYP", add_atoms=[atom("OD1", "O")],
               add_bonds=[bond("CG", "OD1")], set_stereo=[("CG", "R")]),
        # methylated / acetylated / carboxylated lysines
        derive(std["LYS"], "MLZ", add_atoms=[atom("CM", "C")],
               add_bonds=[bond("NZ", "CM")]),
        derive(std["LYS"], "MLY", add_atoms=[atom("CH1", "C"),
                                             atom("CH2", "C")],
               add_bonds=[bond("NZ", "CH1"), bond("NZ", "CH2")]),
        derive(std["LYS"], "M3L",
               add_atoms=[atom("CM1", "C"), atom("CM2", "C"),
                          atom("CM3", "C")],
               add_bonds=[bond("NZ", "CM1"), bond("NZ", "CM2"),
                          bond("NZ", "CM3")],
               set_charge=[("NZ", 1)]),
        derive(std["LYS"], "ALY",
               add_atoms=[atom("CH", "C"), atom("OH", "O"), atom("CH3", "C")],
               add_bonds=[bond("NZ", "CH"), bond("CH", "OH", 2),
                          bond("CH", "CH3")]),
        derive(std["LYS"], "KCX",
               add_atoms=[atom("CX", "C"), atom("OQ1", "O"), atom("OQ2", "O")],
               add_bonds=[bond("NZ", "CX"), bond("CX", "OQ1", 2),
                          bond("CX", "OQ2")]),
        # pyroglutamate (cyclized N-terminal Glu/Gln)
        derive(amino("PCA", ["CB", "CG", "CD", "OE"],
                     [bond("CA", "CB"), bond("CB", "CG"), bond("CG", "CD"),
                      bond("CD", "OE", 2)]), "PCA",
               add_bonds=[bond("CD", "N")]),
        # N-formylmethionine
        derive(std["MET"], "FME", add_atoms=[atom("CN", "C"), atom("O1", "O")],
               add_bonds=[bond("N", "CN"), bond("CN", "O1", 2)]),
    ]


def modified_nucleotides(std):
    """Common modified nucleotides (the tRNA set dominates the PDB's
    modified-NA population: 2MG/M2G/OMC/OMG/5MC/7MG/5MU/PSU/1MA/H2U of
    e.g. 1ehz, plus inosine and the deoxy U/I/5-methyl-C). CCD heavy-atom
    names; ring chemistry approximated as the parent's where a methylation
    formally rearranges double bonds (1MA, 7MG) — topology and elements,
    the properties the featurizer consumes, are exact."""
    mods = [
        # pseudouridine: uracil C-glycoside — relink the sugar to C5
        derive(std["U"], "PSU", del_bonds=[("C1'", "N1")],
               add_bonds=[bond("C1'", "C5")]),
        # base methylations
        derive(std["C"], "5MC", add_atoms=[atom("CM5", "C")],
               add_bonds=[bond("C5", "CM5")]),
        derive(std["DC"], "5CM", add_atoms=[atom("C5A", "C")],
               add_bonds=[bond("C5", "C5A")]),
        derive(std["U"], "5MU", add_atoms=[atom("C5M", "C")],
               add_bonds=[bond("C5", "C5M")]),
        derive(std["A"], "1MA", add_atoms=[atom("CM1", "C")],
               add_bonds=[bond("N1", "CM1")]),
        derive(std["G"], "7MG", add_atoms=[atom("CM7", "C")],
               add_bonds=[bond("N7", "CM7")], set_charge=[("N7", 1)]),
        derive(std["G"], "2MG", add_atoms=[atom("CM2", "C")],
               add_bonds=[bond("N2", "CM2")]),
        derive(std["G"], "M2G", add_atoms=[atom("CM1", "C"),
                                           atom("CM2", "C")],
               add_bonds=[bond("N2", "CM1"), bond("N2", "CM2")]),
        # 2'-O-methylations
        derive(std["C"], "OMC", add_atoms=[atom("CM2", "C")],
               add_bonds=[bond("O2'", "CM2")]),
        derive(std["G"], "OMG", add_atoms=[atom("CM2", "C")],
               add_bonds=[bond("O2'", "CM2")]),
        # dihydrouridine: saturated C5-C6
        derive(std["U"], "H2U",
               set_order=[("C5", "C6", 1, False), ("N1", "C2", 1, False),
                          ("C2", "N3", 1, False), ("N3", "C4", 1, False),
                          ("C4", "C5", 1, False), ("C6", "N1", 1, False)]),
        # 4-thiouridine
        derive(std["U"], "4SU", rename=[("O4", "S4", "S")]),
        # 5-bromo-dU
        derive(std["DU"], "BRU", add_atoms=[atom("BR", "BR")],
               add_bonds=[bond("C5", "BR")]),
    ]
    return mods


def build_all():
    residues = {}
    for aa in AMINO_ACIDS:
        residues[aa["name"]] = aa
    nt_specs = [("A", "A", False), ("G", "G", False),
                ("C", "C", False), ("U", "U", False),
                ("DA", "A", True), ("DG", "G", True),
                ("DC", "C", True), ("DT", "T", True),
                ("DU", "U", True), ("I", "I", False), ("DI", "I", True)]
    for name, kind, deoxy in nt_specs:
        if kind in ("A", "G"):
            base_atoms, base_bonds = purine(kind)
            glyco = "N9"
        elif kind == "I":
            base_atoms, base_bonds = hypoxanthine()
            glyco = "N9"
        else:
            base_atoms, base_bonds = pyrimidine(kind)
            glyco = "N1"
        residues[name] = nucleotide(name, base_atoms, base_bonds, glyco, deoxy)
    for e in modified_amino_acids(residues):
        residues[e["name"]] = e
    for e in modified_nucleotides(residues):
        residues[e["name"]] = e
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
