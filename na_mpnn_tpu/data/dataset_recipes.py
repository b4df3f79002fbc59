"""Per-source dataset CSV recipes.

Script-form port of the reference's make_dataset_csv notebooks
(reference data/datasets/{rcsb_cif_na,rf2na_distillation_cis_bp,
rf2na_distillation_transfac}/make_dataset_csv.ipynb). Each recipe turns a
source-specific inventory into the common training-CSV contract:

    preprocessing_input.csv:  id, structure_path, date, dataset_name [, keys]
    preprocessing_output.csv: + per-attribute *_path columns pointing at the
        offline preprocessor's side files, + ppm_paths (list of experimental
        PPM CSVs per structure)

plus the PPM-library converters for the four public motif formats the
reference consumes (JASPAR PCMs, HOCOMOCO v11 PCMs, cis-BP PPM text files,
TRANSFAC matrix.dat).
"""
from __future__ import annotations

import io
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

NA_TYPES = ("polydeoxyribonucleotide/polyribonucleotide hybrid",
            "polydeoxyribonucleotide", "polyribonucleotide")
BASES = ["A", "C", "G", "T"]


# ---------------------------------------------------------------------------
# PPM-library converters (reference load_ppm_from_raw_pcm / load_raw_ppm /
# preprocess_ppms cells). All return [L, 4] float64 arrays in ACGT order,
# rows normalized to 1.
# ---------------------------------------------------------------------------

def _normalize_counts(counts: np.ndarray) -> np.ndarray:
    counts = np.asarray(counts, np.float64)
    s = counts.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    return counts / s


def load_ppm_jaspar(text: str) -> np.ndarray:
    """JASPAR PCM: '>MA0004.1 NAME' header then per-base rows
    'A  [ 4 19 0 ... ]'."""
    rows = {}
    for line in text.strip().splitlines():
        line = line.strip()
        if not line or line.startswith(">"):
            continue
        base = line[0].upper()
        body = line[1:].replace("[", " ").replace("]", " ")
        rows[base] = [float(v) for v in body.split()]
    counts = np.stack([rows[b] for b in BASES], axis=1)
    return _normalize_counts(counts)


def load_ppm_hocomoco(text: str) -> np.ndarray:
    """HOCOMOCO v11 PCM: '>MOTIF' header then one whitespace-separated
    A C G T count row per position."""
    rows = []
    for line in text.strip().splitlines():
        line = line.strip()
        if not line or line.startswith(">"):
            continue
        rows.append([float(v) for v in line.split()[:4]])
    return _normalize_counts(np.asarray(rows))


def load_ppm_cisbp(text: str) -> np.ndarray:
    """cis-BP PPM text: preamble then a 'Pos\\tA\\tC\\tG\\tT' table
    (reference load_raw_ppm, rf2na_distillation_cis_bp notebook)."""
    import pandas as pd

    table_text = "position" + text.split("Pos")[-1]
    df = pd.read_csv(io.StringIO(table_text), sep="\t")
    df = df.drop(columns=["position"])
    return _normalize_counts(df[BASES].to_numpy(np.float64))


def parse_transfac_matrices(text: str) -> Dict[str, np.ndarray]:
    """TRANSFAC matrix.dat: '//'-separated entries with 'AC  <id>' accession
    and 'P0  A C G T' count tables (reference preprocess_ppms,
    rf2na_distillation_transfac notebook). Returns {matrix_id: ppm}."""
    out: Dict[str, np.ndarray] = {}
    for entry in text.strip().split("//"):
        entry = entry.strip()
        if not entry:
            continue
        matrix_id = None
        rows: List[List[float]] = []
        reading = False
        for line in entry.splitlines():
            line = line.rstrip()
            if line.startswith("AC"):
                matrix_id = line.split(None, 1)[1].strip()
            elif line.startswith("P0"):
                reading = True
            elif reading and line[:2].strip().isdigit():
                parts = line.split()
                rows.append([float(v) for v in parts[1:5]])
            elif reading and not line[:2].strip().isdigit():
                reading = False
        if matrix_id and rows:
            out[matrix_id] = _normalize_counts(np.asarray(rows))
    return out


def preprocess_ppm_directory(raw_dir: str, out_dir: str, fmt: str):
    """Convert every raw motif file in raw_dir into a normalized ACGT CSV in
    out_dir (the reference's preprocess_pcms_into_ppms / preprocess_ppms)."""
    import pandas as pd

    loader = {"jaspar": load_ppm_jaspar, "hocomoco": load_ppm_hocomoco,
              "cisbp": load_ppm_cisbp}[fmt]
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(os.listdir(raw_dir)):
        path = os.path.join(raw_dir, name)
        if not os.path.isfile(path):
            continue
        try:
            ppm = loader(open(path).read())
        except (ValueError, KeyError, IndexError):
            continue
        out = os.path.join(out_dir, os.path.splitext(name)[0] + ".csv")
        pd.DataFrame(ppm, columns=BASES).to_csv(out, index=False)


def preprocess_transfac_ppms(matrix_dat_path: str, out_dir: str):
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    for matrix_id, ppm in parse_transfac_matrices(
            open(matrix_dat_path).read()).items():
        pd.DataFrame(ppm, columns=BASES).to_csv(
            os.path.join(out_dir, matrix_id + ".csv"), index=False)


# ---------------------------------------------------------------------------
# Source filters + input CSVs
# ---------------------------------------------------------------------------

def _listify(v):
    if isinstance(v, str):
        return v.strip("[]").replace("'", "").split(", ") if v.strip("[]") else []
    return v or []


def sequence_x_filter(seqs: Sequence[str], max_x: int = 20) -> bool:
    """Drop structures dominated by unknown residues (reference seq_filter:
    allow when the longest chain is short, else reject if X is the most
    common letter with count > max_x)."""
    seqs = [s for s in seqs if isinstance(s, str)]
    if not seqs:
        return True
    if max(len(s) for s in seqs) <= max_x:
        return True
    import collections
    top = collections.Counter("".join(seqs)).most_common(1)[0]
    return not (top[0] == "X" and top[1] > max_x)


def make_rcsb_cif_na_input(scan_df, structure_directory: str,
                           min_heavy: int = 100, min_coverage: float = 0.9,
                           max_resolution: float = 3.5):
    """RCSB NA subset recipe (rcsb_cif_na notebook): heavy-atom / coverage /
    unknown-sequence / resolution filters + must contain a nucleic chain."""
    df = scan_df.copy()
    for key in ("poly", "poly_type", "nonpoly", "poly_sequence"):
        if key in df:
            df[key] = df[key].apply(_listify)
    sel = (df["num_heavy"] >= min_heavy) & (df["coverage"] >= min_coverage)
    sel &= df["poly_sequence"].apply(sequence_x_filter)
    sel &= (df["resolution"] <= max_resolution) | df["resolution"].isna()
    sel &= df["poly_type"].apply(lambda ts: any(t in NA_TYPES for t in ts))
    df = df[sel].copy()
    df["id"] = df["label"]
    df["structure_path"] = (structure_directory + os.sep
                            + df["id"].str.slice(1, 3) + os.sep
                            + df["id"] + ".cif.gz")
    df["dataset_name"] = "rcsb_cif_na"
    return df[["id", "structure_path", "date", "dataset_name"]].copy()


def make_distillation_input(df, structure_directory: str, dataset_name: str,
                            id_column: str, max_i_pae: float = 6.0,
                            min_plddt: float = 0.85,
                            path_fn=None):
    """Distillation-set recipe (rf2na_distillation_* notebooks): AF-confidence
    filters + synthetic 1970 date. `path_fn(row) -> structure_path` defaults
    to <dir>/<id[:2]>/<id>.pdb."""
    df = df[(df["i_pae"] <= max_i_pae) & (df["plddt"] >= min_plddt)].copy()
    df = df.reset_index(drop=True)
    df["dataset_name"] = dataset_name
    df["date"] = "1970-01-01"
    if path_fn is None:
        def path_fn(row):
            return os.path.join(structure_directory, row["id"][:2],
                                row["id"] + ".pdb")
    df["structure_path"] = df.apply(path_fn, axis=1)
    cols = ["id", "structure_path", "date", "dataset_name"]
    extra = [c for c in (id_column,) if c and c in df.columns]
    return df[cols + extra].copy()


# ---------------------------------------------------------------------------
# Post-preprocessing assembly (shared by every recipe)
# ---------------------------------------------------------------------------

def drop_failed_preprocessing(df, preprocessed_data_directory: str):
    """Remove rows whose id appears in the preprocessor's bad/ directory;
    returns (df, {reason: count})."""
    failed_dir = os.path.join(preprocessed_data_directory, "bad")
    failed, reasons = [], {}
    if os.path.isdir(failed_dir):
        for name in os.listdir(failed_dir):
            sid = os.path.splitext(name)[0]
            failed.append(sid)
            reason = open(os.path.join(failed_dir, name)).read()
            reasons[reason] = reasons.get(reason, 0) + 1
    df = df[~df["id"].isin(failed)].copy()
    return df, reasons


def attach_preprocessed_paths(df, preprocessed_data_directory: str):
    """Add one <attribute>_path column per preprocessor side-file directory
    (the eight .npy dirs + sequences CSVs)."""
    for attr in sorted(os.listdir(preprocessed_data_directory)):
        attr_dir = os.path.join(preprocessed_data_directory, attr)
        if attr == "bad" or not os.path.isdir(attr_dir):
            continue
        ext = ".csv" if attr == "sequences" else ".npy"
        paths = {}
        for sid in df["id"]:
            p = os.path.join(attr_dir, str(sid) + ext)
            if not os.path.exists(p):
                raise FileNotFoundError(p)
            paths[sid] = p
        df[attr + "_path"] = df["id"].map(paths)
    return df


def attach_ppm_paths(df, id_to_ppm_paths: Dict[str, List[List[str]]],
                     key_column: str = "id", drop_key: bool = False):
    """ppm_paths column from an id->paths mapping (the last stage of every
    specificity recipe)."""
    df = df.copy()
    df["ppm_paths"] = df[key_column].apply(
        lambda k: id_to_ppm_paths.get(k, []))
    if drop_key and key_column != "id":
        df = df.drop(columns=[key_column])
    return df


def build_preprocessing_output(input_csv: str, preprocessed_data_directory: str,
                               output_csv: str,
                               id_to_ppm_paths: Optional[Dict] = None,
                               key_column: str = "id"):
    """input CSV + preprocessor outputs -> preprocessing_output.csv (the
    common tail of every make_dataset_csv notebook)."""
    import pandas as pd

    df = pd.read_csv(input_csv)
    df, reasons = drop_failed_preprocessing(df, preprocessed_data_directory)
    df = attach_preprocessed_paths(df, preprocessed_data_directory)
    if id_to_ppm_paths is not None:
        df = attach_ppm_paths(df, id_to_ppm_paths, key_column,
                              drop_key=key_column != "id")
    df.to_csv(output_csv, index=False)
    return df, reasons
