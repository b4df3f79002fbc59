"""Minimal ProDy stand-in, faithful to the documented ProDy semantics the
reference inference parser relies on (parse_PDB, inference/data_utils.py:84-405),
so the reference code can run VERBATIM as a parity oracle without ProDy
installed.

Implemented surface:
* ``parsePDB(path)``: ATOM/HETATM records, altloc ' ' or 'A', first MODEL.
* ``confProDy(**kw)``: no-op.
* ``Selection.select(expr)`` with the grammar parse_PDB uses: ``protein``,
  ``nucleic``, ``water``, ``chain X``, ``name N``, ``occupancy > 0``,
  ``and`` / ``or`` / ``not`` (and binds tighter than or), parentheses.
  Selections return None when empty — parse_PDB branches on that.
* getters: getCoords, getResnums, getChids, getIcodes, getResnames,
  getChindices (chain index by order of first appearance in the file, as
  ProDy's hierarchical view assigns), getElements.

Flag sets mirror ProDy's flag definitions (prody/atomic/flags.py): protein =
standard + non-standard amino-acid resnames, nucleic = nucleobase/nucleotide/
nucleoside resnames, water = the water resnames.
"""
from __future__ import annotations

import re

import numpy as np

# Flag resname sets are imported from the package parser so shim and
# production parser share ONE definition (they must classify identically
# for the oracle comparison to be meaningful; see the provenance note at
# na_mpnn_tpu/data/pdb.py on how the sets were reconstructed).
from na_mpnn_tpu.data.pdb import (NUCLEIC_RESNAMES, PROTEIN_RESNAMES,  # noqa: E402
                                  WATER_RESNAMES)


def confProDy(**kwargs):
    return None


class _Atoms:
    """AtomGroup/Selection lookalike over parallel numpy arrays."""

    def __init__(self, fields):
        self._f = fields

    def __len__(self):
        return len(self._f["name"])

    # --- getters (ProDy API names) ---
    def getCoords(self):
        return self._f["coords"].copy()

    def getResnums(self):
        return self._f["resnum"].copy()

    def getChids(self):
        return self._f["chid"].copy()

    def getIcodes(self):
        return self._f["icode"].copy()

    def getResnames(self):
        return self._f["resname"].copy()

    def getChindices(self):
        return self._f["chindex"].copy()

    def getElements(self):
        return self._f["element"].copy()

    def getNames(self):
        return self._f["name"].copy()

    def getOccupancies(self):
        return self._f["occupancy"].copy()

    # --- selection ---
    def select(self, expr: str):
        mask = _SelectionParser(expr, self._f).evaluate()
        if not mask.any():
            return None
        return _Atoms({k: v[mask] for k, v in self._f.items()})


class _SelectionParser:
    """Recursive-descent parser for the subset of ProDy's selection grammar
    used by parse_PDB. `and` binds tighter than `or`; `not` is unary."""

    def __init__(self, expr: str, fields):
        self.tokens = re.findall(r"\(|\)|>|<|=|[^\s()<>=]+", expr)
        self.pos = 0
        self.f = fields

    def evaluate(self):
        out = self._or()
        if self.pos != len(self.tokens):
            raise ValueError(f"trailing tokens in selection: "
                             f"{self.tokens[self.pos:]}")
        return out

    def _peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _next(self):
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def _or(self):
        out = self._and()
        while self._peek() == "or":
            self._next()
            out = out | self._and()
        return out

    def _and(self):
        out = self._factor()
        while self._peek() == "and":
            self._next()
            out = out & self._factor()
        return out

    def _factor(self):
        tok = self._peek()
        if tok == "not":
            self._next()
            return ~self._factor()
        if tok == "(":
            self._next()
            out = self._or()
            assert self._next() == ")"
            return out
        return self._predicate()

    def _predicate(self):
        tok = self._next()
        if tok == "protein":
            return np.isin(self.f["resname"], list(PROTEIN_RESNAMES))
        if tok == "nucleic":
            return np.isin(self.f["resname"], list(NUCLEIC_RESNAMES))
        if tok == "water":
            return np.isin(self.f["resname"], list(WATER_RESNAMES))
        if tok == "hetero":
            return self.f["hetero"].copy()
        if tok == "chain":
            vals = [self._next()]
            return np.isin(self.f["chid"], vals)
        if tok == "name":
            vals = [self._next()]
            return np.isin(self.f["name"], vals)
        if tok == "occupancy":
            op = self._next()
            rhs = float(self._next())
            if op == ">":
                return self.f["occupancy"] > rhs
            if op == "<":
                return self.f["occupancy"] < rhs
            if op == "=":
                return self.f["occupancy"] == rhs
        raise ValueError(f"unsupported selection token: {tok}")


def parsePDB(path: str, **kwargs):
    """Parse ATOM/HETATM records of the first model, altloc ' ' or 'A' only
    (ProDy parsePDB defaults)."""
    names, resnames, chids, resnums, icodes = [], [], [], [], []
    coords, occs, elements, hetero = [], [], [], []
    with open(path) as f:
        for line in f:
            rec = line[:6]
            if rec == "ENDMDL":
                break
            if not (rec.startswith("ATOM") or rec.startswith("HETATM")):
                continue
            altloc = line[16]
            if altloc not in (" ", "A"):
                continue
            names.append(line[12:16].strip())
            resnames.append(line[17:20].strip())
            chids.append(line[21])
            resnums.append(int(line[22:26]))
            icodes.append(line[26].strip())
            coords.append((float(line[30:38]), float(line[38:46]),
                           float(line[46:54])))
            occ = line[54:60].strip()
            occs.append(float(occ) if occ else 1.0)
            el = line[76:78].strip() if len(line) >= 78 else ""
            if not el:
                el = next((c for c in line[12:16] if c.isalpha()), "")
            elements.append(el)
            hetero.append(rec.startswith("HETATM"))
    if not names:
        return None

    chids = np.asarray(chids)
    order = {c: i for i, c in enumerate(dict.fromkeys(chids.tolist()))}
    fields = {
        "name": np.asarray(names),
        "resname": np.asarray(resnames),
        "chid": chids,
        "resnum": np.asarray(resnums, np.int64),
        "icode": np.asarray(icodes),
        "coords": np.asarray(coords, np.float64),
        "occupancy": np.asarray(occs, np.float64),
        "element": np.asarray(elements),
        "chindex": np.asarray([order[c] for c in chids], np.int64),
        "hetero": np.asarray(hetero, bool),
    }
    return _Atoms(fields)
