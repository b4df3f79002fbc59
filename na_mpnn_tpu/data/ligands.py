"""Ligand residue library: chem_comp parsing, leaving groups, automorphisms.

Native replacement for the reference's OpenBabel-backed ligand layer
(reference cifutils.py:77-293 ParsePDBLigand/parseLigand/getLeavingAtoms2 and
obutils.py:15-243 FindAutomorphisms/GetChirals/GetPlanars). The reference
builds its residue library from the PDB chemical-component dictionary via
OpenBabel (SDF round-trip) and caches it as ligands.json.gz (a large blob
absent from the snapshot); here every property is derived directly from the
chem_comp mmCIF tables, which carry the same information:

* atoms: element, formal charge, stereo flag, leaving flag, pdbx_align,
  ideal coordinates            (chem_comp_atom)
* bonds: order, aromaticity    (chem_comp_bond)
* leaving groups: graph reachability over the bond graph — a neighbor
  flagged pdbx_leaving_atom_flag=Y plus everything it disconnects
  (reference getLeavingAtoms2, cifutils.py:171-189)
* automorphisms: element-preserving, bond-preserving graph automorphisms of
  the heavy-atom graph (reference FindAutomorphisms via OpenBabel
  isomorphism, obutils.py:15-87), filtered to columns with alternative
  mappings and to mappings not touching leaving atoms (cifutils.py:262-270)
* chirals: atoms with an R/S pdbx_stereo_config (role of GetChirals)
* planars: atoms of aromatic or double bonds with 3+ heavy neighbors
  (role of GetPlanars: sp2 centers whose substituents are coplanar)
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

LigAtom = collections.namedtuple(
    "LigAtom", ["name", "element", "charge", "leaving", "leaving_group",
                "parent", "align", "stereo", "aromatic", "xyz"])
LigBond = collections.namedtuple(
    "LigBond", ["a", "b", "order", "aromatic", "in_ring"])
LigandResidue = collections.namedtuple(
    "LigandResidue", ["name", "atoms", "bonds", "automorphisms", "chirals",
                      "planars"])

_BOND_ORDER = {"SING": 1, "DOUB": 2, "TRIP": 3, "QUAD": 4, "AROM": 1}


def parse_chem_comp_cif(path: str) -> Dict:
    """Parse one PDB chemical-component definition (chem_comp_atom +
    chem_comp_bond tables) — role of reference ParsePDBLigand
    (cifutils.py:77-119), without the pdbx reader dependency."""
    from .cif import read_cif

    tables = read_cif(path)
    cca = tables.get("chem_comp_atom")
    if cca is None:
        raise ValueError(f"no chem_comp_atom table in {path}")

    def col(table, key, k, default=None):
        v = table.get(k, key, default)
        return v

    atoms = []
    for k in range(len(cca)):
        xyz = []
        for c in ("model_Cartn_x", "model_Cartn_y", "model_Cartn_z"):
            v = col(cca, c, k, "?")
            xyz.append(float(v) if v not in ("?", ".", None) else np.nan)
        charge = col(cca, "charge", k, "0")
        atoms.append({
            "atom_id": col(cca, "atom_id", k).strip('"'),
            "symbol": (col(cca, "type_symbol", k) or "").upper(),
            "leaving": col(cca, "pdbx_leaving_atom_flag", k, "N") == "Y",
            "align": int(col(cca, "pdbx_align", k, "0") or 0),
            "charge": int(charge) if charge not in ("?", ".", None) else 0,
            "stereo": col(cca, "pdbx_stereo_config", k, "N") or "N",
            "aromatic": col(cca, "pdbx_aromatic_flag", k, "N") == "Y",
            "xyz": xyz,
        })

    bonds = []
    ccb = tables.get("chem_comp_bond")
    if ccb is not None:
        for k in range(len(ccb)):
            order_raw = (col(ccb, "value_order", k, "SING") or "SING").upper()
            bonds.append({
                "a": col(ccb, "atom_id_1", k).strip('"'),
                "b": col(ccb, "atom_id_2", k).strip('"'),
                "order": _BOND_ORDER.get(order_raw, 1),
                "aromatic": col(ccb, "pdbx_aromatic_flag", k, "N") == "Y",
            })

    comp = tables.get("chem_comp")
    name = comp.get(0, "id", "") if comp is not None else \
        os.path.splitext(os.path.basename(path))[0].upper()
    return {"name": name, "atoms": atoms, "bonds": bonds}


def leaving_group_of(aname: str, G) -> List[str]:
    """Atoms removed with `aname`'s leaving neighbors: each leaving neighbor
    plus any component it disconnects (reference getLeavingAtoms2,
    cifutils.py:171-189)."""
    import networkx as nx

    if G.nodes[aname]["leaving"]:
        return []
    group = set()
    for m in G.neighbors(aname):
        if not G.nodes[m]["leaving"]:
            continue
        group.add(m)
        H = G.subgraph(set(G.nodes) - {m})
        ccs = list(nx.connected_components(H))
        if len(ccs) > 1:
            for cc in ccs:
                if aname not in cc:
                    group.update(cc)
    return sorted(group)


def find_automorphisms(atom_ids: Sequence[str], elements: Sequence[str],
                       bonds: Sequence[Tuple[str, str]],
                       leaving: Optional[Sequence[bool]] = None,
                       max_count: int = 1000,
                       charges: Optional[Sequence[int]] = None,
                       bond_orders: Optional[Sequence[int]] = None) -> List[List[str]]:
    """Chemically-valid automorphisms of the heavy-atom graph, as rows of
    atom names: mappings must preserve element, formal charge, adjacency,
    and bond order (OpenBabel's symmetry classes carry the same invariants;
    reference FindAutomorphisms, obutils.py:15-87). Only columns with
    alternative mappings are retained, and — like the reference
    (cifutils.py:262-270) — every row whose retained columns contain a
    leaving atom is dropped, including the identity row."""
    import networkx as nx
    from networkx.algorithms import isomorphism

    elem = dict(zip(atom_ids, elements))
    chg = dict(zip(atom_ids, charges)) if charges is not None else {}
    heavy = [a for a in atom_ids if elem[a].upper() not in ("H", "D")]
    hset = set(heavy)
    G = nx.Graph()
    G.add_nodes_from((a, {"el": elem[a].upper(), "q": chg.get(a, 0)})
                     for a in heavy)
    orders = list(bond_orders) if bond_orders is not None else [1] * len(bonds)
    G.add_edges_from((a, b, {"o": o}) for (a, b), o in zip(bonds, orders)
                     if a in hset and b in hset)

    gm = isomorphism.GraphMatcher(
        G, G, node_match=lambda x, y: x["el"] == y["el"] and x["q"] == y["q"],
        edge_match=lambda x, y: x["o"] == y["o"])
    autos = []
    for mapping in gm.isomorphisms_iter():
        autos.append([mapping[a] for a in heavy])
        if len(autos) >= max_count:
            break
    if not autos:
        return []
    # Put the identity first (GraphMatcher yields it in arbitrary position).
    autos.sort(key=lambda row: row != list(heavy))
    A = np.array(autos)

    # Retain only columns that actually permute.
    varies = (A[:1] != A).any(axis=0)
    A = A[:, varies]
    if A.shape[1] == 0:
        return []

    # Drop mappings involving leaving atoms.
    if leaving is not None and A.shape[0] > 1:
        is_leaving = dict(zip(atom_ids, leaving))
        keep = [not any(is_leaving.get(a, False) for a in row) for row in A]
        A = A[np.asarray(keep, bool)]
    return A.tolist()


def build_residue(raw: Dict) -> LigandResidue:
    """chem_comp dict -> LigandResidue with leaving groups, automorphisms,
    chirals, planars (role of reference parseLigand, cifutils.py:191-293)."""
    import networkx as nx

    atoms_raw = raw["atoms"]
    bonds_raw = raw["bonds"]
    elem = {a["atom_id"]: a["symbol"] for a in atoms_raw}

    G = nx.Graph()
    G.add_nodes_from((a["atom_id"], {"leaving": a["leaving"]})
                     for a in atoms_raw)
    G.add_edges_from((b["a"], b["b"]) for b in bonds_raw)

    neighbors = {a["atom_id"]: list(G.neighbors(a["atom_id"]))
                 if a["atom_id"] in G else [] for a in atoms_raw}

    atoms = {}
    for a in atoms_raw:
        # parent = (last) heavy neighbor, matching the reference's loop
        # semantics (cifutils.py:222-226).
        parent = None
        for nb in neighbors[a["atom_id"]]:
            if elem.get(nb, "").upper() not in ("H", "D"):
                parent = nb
        atoms[a["atom_id"]] = LigAtom(
            name=a["atom_id"], element=a["symbol"], charge=a["charge"],
            leaving=a["leaving"],
            leaving_group=leaving_group_of(a["atom_id"], G)
            if a["atom_id"] in G else [],
            parent=parent, align=a["align"], stereo=a["stereo"],
            aromatic=a["aromatic"], xyz=a["xyz"])

    ring_nodes = set()
    for cycle in nx.cycle_basis(G):
        ring_nodes.update(cycle)
    bonds = [LigBond(a=b["a"], b=b["b"], order=b["order"],
                     aromatic=b["aromatic"],
                     in_ring=b["a"] in ring_nodes and b["b"] in ring_nodes)
             for b in bonds_raw]

    autos = find_automorphisms(
        [a["atom_id"] for a in atoms_raw],
        [a["symbol"] for a in atoms_raw],
        [(b["a"], b["b"]) for b in bonds_raw],
        [a["leaving"] for a in atoms_raw],
        charges=[a["charge"] for a in atoms_raw],
        bond_orders=[b["order"] for b in bonds_raw])

    chirals = [a["atom_id"] for a in atoms_raw if a["stereo"] in ("R", "S")]
    heavy_deg = {a: sum(1 for nb in neighbors[a]
                        if elem.get(nb, "").upper() not in ("H", "D"))
                 for a in elem}
    planar_atoms = set()
    for b in bonds_raw:
        if b["aromatic"] or b["order"] == 2:
            for end in (b["a"], b["b"]):
                if heavy_deg.get(end, 0) >= 3:
                    planar_atoms.add(end)
    return LigandResidue(name=raw["name"], atoms=atoms, bonds=bonds,
                         automorphisms=autos, chirals=chirals,
                         planars=sorted(planar_atoms))


class ResidueLibrary:
    """Lazy residue library (role of reference CIFParser.mols + getRes,
    cifutils.py:126-160): entries come from a directory of chem_comp .cif
    files and/or a precompiled JSON(.gz) of parse_chem_comp_cif outputs;
    residues are built on first access and cached."""

    def __init__(self, cif_dir: Optional[str] = None,
                 json_path: Optional[str] = None,
                 skip_res: Sequence[str] = ()):
        self._raw: Dict[str, Dict] = {}
        self._built: Dict[str, LigandResidue] = {}
        self._cif_paths: Dict[str, str] = {}
        skip = set(skip_res)
        if json_path:
            opener = gzip.open if json_path.endswith(".gz") else open
            with opener(json_path, "rt") as f:
                for name, raw in json.load(f).items():
                    if name not in skip:
                        self._raw[name] = raw
        if cif_dir:
            for p in glob.glob(os.path.join(cif_dir, "*.cif")):
                name = os.path.splitext(os.path.basename(p))[0].upper()
                if name not in skip:
                    self._cif_paths[name] = p

    def __contains__(self, resname: str) -> bool:
        return resname in self._raw or resname in self._cif_paths

    def get(self, resname: str) -> Optional[LigandResidue]:
        if resname in self._built:
            return self._built[resname]
        raw = self._raw.get(resname)
        if raw is None and resname in self._cif_paths:
            raw = parse_chem_comp_cif(self._cif_paths[resname])
        if raw is None:
            return None
        res = build_residue(raw)
        self._built[resname] = res
        return res

    def save_json(self, path: str):
        """Precompile the raw entries (reference ligands.json.gz analog)."""
        raw = dict(self._raw)
        for name, p in self._cif_paths.items():
            if name not in raw:
                raw[name] = parse_chem_comp_cif(p)
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "wt") as f:
            json.dump(raw, f)
