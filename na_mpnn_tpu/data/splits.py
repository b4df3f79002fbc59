"""Released data-split readers.

The reference releases its train/valid/test splits as JSON under ``splits/``
(format documented in reference splits/README.md:1-17):

* design splits: a list of PDB IDs;
* specificity splits: a list of [PDB ID, [PPM ID, ...]] pairs;
* eval subsets: same shapes, smaller.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple


def load_design_split(path: str) -> List[str]:
    """Design split JSON -> list of PDB IDs."""
    data = json.load(open(path))
    if not isinstance(data, list) or (data and not isinstance(data[0], str)):
        raise ValueError(f"{path}: not a design split (expected a list of PDB IDs)")
    return data


def load_specificity_split(path: str) -> List[Tuple[str, List[str]]]:
    """Specificity split JSON -> list of (PDB ID, [PPM IDs])."""
    data = json.load(open(path))
    out = []
    for entry in data:
        if isinstance(entry, str):
            out.append((entry, []))
        else:
            pdb_id, ppm_ids = entry[0], entry[1]
            out.append((str(pdb_id), list(ppm_ids)))
    return out


def filter_dataframe_by_split(df, split_ids, id_column: str = "structure_path"):
    """Subset a dataset CSV to the structures named in a split; IDs are
    matched against the basename stem of id_column."""
    ids = set(s.lower() for s in split_ids)

    def stem(p):
        name = os.path.basename(str(p))
        for ext in (".gz", ".cif", ".pdb"):
            if name.endswith(ext):
                name = name[: -len(ext)]
        if name.startswith("pdb"):
            name = name[3:]
        return name.lower()

    return df[df[id_column].map(stem).isin(ids)]


def available_reference_splits(splits_dir: str) -> Dict[str, str]:
    """Map split name -> path for every JSON in a splits directory."""
    out = {}
    if os.path.isdir(splits_dir):
        for f in sorted(os.listdir(splits_dir)):
            if f.endswith(".json"):
                out[os.path.splitext(f)[0]] = os.path.join(splits_dir, f)
    return out
