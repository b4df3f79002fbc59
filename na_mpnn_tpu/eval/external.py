"""Wrappers for external evaluation binaries (DSSR, EternaFold, US-align,
AlphaFold3, RibonanzaNet, DeepPBS, gRNAde, RhoDesign).

These mirror the reference harness's subprocess layer (reference
evaluation/na_eval_utils.py:594-866,1034-1415,1705-1836,2511-2786): the
binaries are evaluation-only dependencies that are not shipped; every wrapper
checks availability and raises ExternalToolUnavailable with the exact command
it would have run, so pipelines can skip the metric gracefully.
"""
from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import tempfile
from typing import Dict, List, Optional

from .scoring import standardize_rna_sequence, standardize_secondary_structure


class ExternalToolUnavailable(RuntimeError):
    pass


def _require(binary: str, env_var: Optional[str] = None) -> str:
    path = os.environ.get(env_var) if env_var else None
    path = path or shutil.which(binary)
    if not path:
        raise ExternalToolUnavailable(
            f"{binary} not found on PATH"
            + (f" (set {env_var})" if env_var else ""))
    return path


def run_dssr(structure_path: str, dssr_binary: str = "x3dna-dssr") -> Dict:
    """Extract sequence + dot-bracket secondary structure with DSSR
    (reference run_dssr, evaluation/na_eval_utils.py:594-664)."""
    binary = _require(dssr_binary, "DSSR_BINARY")
    with tempfile.TemporaryDirectory() as tmp:
        out = subprocess.run(
            [binary, f"--input={structure_path}", "--output=dssr_out.txt"],
            cwd=tmp, capture_output=True, text=True, check=True)
        text = open(os.path.join(tmp, "dssr_out.txt")).read()
    seq_match = re.search(r">.*\n([ACGUacgu&?\.\w]+)\n([\.\(\)\[\]\{\}<>A-Za-z&,?]+)", text)
    if not seq_match:
        raise RuntimeError(f"could not parse DSSR output for {structure_path}")
    sequence = standardize_rna_sequence(seq_match.group(1), method="dssr")
    ss = standardize_secondary_structure(seq_match.group(2), method="dssr")
    return {"sequence": sequence, "secondary_structure": ss, "raw": text,
            "stdout": out.stdout}


def run_eternafold(sequence: str, eternafold_binary: str = "eternafold") -> Dict:
    """Predict secondary structure with EternaFold (reference run_eternafold,
    evaluation/na_eval_utils.py:669-729)."""
    binary = _require(eternafold_binary, "ETERNAFOLD_BINARY")
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        f.write(f">query\n{sequence}\n")
        fasta = f.name
    try:
        out = subprocess.run([binary, "predict", fasta], capture_output=True,
                             text=True, check=True)
    finally:
        os.unlink(fasta)
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    ss = lines[-1].strip()
    return {"secondary_structure": standardize_secondary_structure(ss)}


def run_us_align(reference_structure_path: str, subject_structure_path: str,
                 usalign_binary: str = "USalign") -> Dict:
    """TM-score / RMSD via US-align (reference run_us_align,
    evaluation/na_eval_utils.py:1705-1836)."""
    binary = _require(usalign_binary, "USALIGN_BINARY")
    out = subprocess.run(
        [binary, subject_structure_path, reference_structure_path,
         "-mol", "RNA"],
        capture_output=True, text=True, check=True)
    tm = None
    rmsd = None
    for line in out.stdout.splitlines():
        m = re.match(r"TM-score=\s*([\d.]+)", line)
        if m and tm is None:
            tm = float(m.group(1))
        m = re.search(r"RMSD=\s*([\d.]+)", line)
        if m and rmsd is None:
            rmsd = float(m.group(1))
    return {"tm_score": tm, "rmsd": rmsd, "stdout": out.stdout}


def run_alphafold3(name: str, sequence: str, output_directory: str,
                   af3_cmd: Optional[List[str]] = None) -> Dict:
    """Fold an RNA sequence with AlphaFold3 (reference run_alphafold3,
    evaluation/na_eval_utils.py:871-1029). `af3_cmd` is the site-specific
    launcher (the reference shells into an apptainer image)."""
    if af3_cmd is None:
        raise ExternalToolUnavailable(
            "AlphaFold3 launcher not configured (pass af3_cmd or set up a "
            "site launcher)")
    os.makedirs(output_directory, exist_ok=True)
    request = {
        "name": name,
        "sequences": [{"rna": {"id": "A", "sequence": sequence}}],
        "modelSeeds": [1],
        "dialect": "alphafold3",
        "version": 1,
    }
    request_path = os.path.join(output_directory, f"{name}_af3_input.json")
    with open(request_path, "w") as f:
        json.dump(request, f)
    subprocess.run(list(af3_cmd) + ["--json_path", request_path,
                                    "--output_dir", output_directory],
                   check=True)
    model_dir = os.path.join(output_directory, name.lower())
    return {"output_directory": model_dir,
            "predicted_structure_path": os.path.join(model_dir, f"{name.lower()}_model.cif")}


def run_ribonanza_net(sequence: str, script: Optional[str] = None) -> Dict:
    """Reactivity profile + secondary structure via RibonanzaNet (reference
    run_ribonanza_net_*, evaluation/na_eval_utils.py:731-866 +
    evaluation/run_ribonanza_net.py)."""
    if script is None:
        script = os.environ.get("RIBONANZA_NET_SCRIPT")
    if not script or not os.path.exists(script):
        raise ExternalToolUnavailable(
            "RibonanzaNet runner not configured (set RIBONANZA_NET_SCRIPT)")
    with tempfile.TemporaryDirectory() as tmp:
        out_json = os.path.join(tmp, "out.json")
        subprocess.run(["python", script, "--sequence", sequence,
                        "--output", out_json], check=True)
        return json.load(open(out_json))
