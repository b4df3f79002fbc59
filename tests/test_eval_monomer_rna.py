"""End-to-end RNA-monomer evaluation protocol with external stages mocked
(reference protocol: evaluation/evaluation_cmds.txt:110-177 — design ->
process_reference (DSSR) -> process_design (EternaFold + RibonanzaNet + AF3)
-> score_design), plus unit tests of the native Hungarian secondary-structure
extractor and the external-wrapper parsers."""
import json
import os

import numpy as np
import pytest

from na_mpnn_tpu.eval import external, harness
from na_mpnn_tpu.eval.ribonanza_runner import (extract_secondary_structure,
                                               hungarian_base_pairs,
                                               mask_diagonal,
                                               pairs_to_dot_bracket)


# ---------------------------------------------------------------------------
# Native Hungarian extractor
# ---------------------------------------------------------------------------

def _pair_matrix(n, pairs, p=0.95):
    m = np.zeros((n, n))
    for i, j in pairs:
        m[i, j] = m[j, i] = p
    return m


def test_hungarian_recovers_planted_pairs():
    pairs = [(0, 19), (1, 18), (2, 17), (5, 12), (6, 11)]
    prob = _pair_matrix(20, pairs)
    got = hungarian_base_pairs(prob, theta=0.5)
    assert sorted(got) == sorted(pairs)


def test_hungarian_helix_filter():
    # one isolated pair + a 3-stack helix; min_len_helix=2 drops the singleton
    pairs = [(0, 19), (5, 15), (6, 14), (7, 13)]
    prob = _pair_matrix(20, pairs)
    got = hungarian_base_pairs(prob, theta=0.5, min_len_helix=2)
    assert sorted(got) == [(5, 15), (6, 14), (7, 13)]


def test_dot_bracket_pseudoknot_layers():
    ss = pairs_to_dot_bracket([(0, 10), (1, 9), (4, 14)], 16)
    assert ss[0] == "(" and ss[10] == ")"
    assert ss[4] == "[" and ss[14] == "]"       # crossing pair -> next layer
    from na_mpnn_tpu.eval.scoring import base_pairs_and_loops
    pairs, _ = base_pairs_and_loops(ss)
    assert sorted(pairs) == [(0, 10), (1, 9), (4, 14)]


def test_extract_secondary_structure_masks_diagonal():
    # a near-diagonal "pair" must be suppressed by the |i-j|<4 mask
    prob = _pair_matrix(12, [(3, 5), (0, 11)])
    ss, pairs, mat = extract_secondary_structure(prob)
    assert (3, 5) not in pairs and (0, 11) in pairs
    assert mat[0, 11] == 1 and mat[11, 0] == 1
    assert mask_diagonal(prob)[3, 5] == 0


# ---------------------------------------------------------------------------
# External-wrapper parsers (pure post-processing, no binaries)
# ---------------------------------------------------------------------------

def test_deeppbs_output_conversion():
    from na_mpnn_tpu import constants
    L = 6
    rng = np.random.RandomState(0)
    P = rng.rand(L, 4)
    P /= P.sum(-1, keepdims=True)
    seq = np.eye(4)[rng.randint(0, 4, L)]
    res = external.deeppbs_output_to_result({"P": P, "Seq": seq}, "s", "/x/s.pdb")
    ppm = np.asarray(res["predicted_ppm_na_mpnn_format"])
    assert ppm.shape == (2 * L, constants.NUM_LETTERS)
    t = constants.restype_to_int_table(True)
    # first strand preserved
    np.testing.assert_allclose(ppm[:L, t["DA"]], P[:, 0])
    # second strand is the reverse complement (flip both axes)
    np.testing.assert_allclose(ppm[L:, t["DA"]], P[::-1, 3])
    assert list(res["chain_labels"]) == [0] * L + [1] * L
    # true sequence round-trips through the 33-token table
    assert res["true_sequence_na_mpnn_format"][0] in t.values()


def test_grnade_fasta_parse():
    entries = [("native", "ACGU"),
               ("sample=0, recovery=0.75", "ACGG"),
               ("sample=1, recovery=0.5", "ACCU")]
    out = external.parse_grnade_fasta(entries, "rna1", "/x/rna1.pdb")
    assert len(out) == 2
    assert out[0]["design_sequence"] == "ACGG"
    assert out[0]["tool_reported_sequence_recovery"] == 0.75
    assert out[1]["name"] == "rna1_1"
    assert out[0]["design_method"] == "grnade"


def test_rhodesign_stdout_parse():
    text = "some log\nsequence: ACGUACGU\nrecovery rate: 0.625\n"
    seq, rec = external.parse_rhodesign_output(text)
    assert seq == "ACGUACGU" and rec == 0.625
    with pytest.raises(ValueError):
        external.parse_rhodesign_output("nothing useful")


def test_external_tools_raise_when_unconfigured(monkeypatch):
    for var in ("DEEPPBS_CMD", "GRNADE_CMD", "RHODESIGN_CMD",
                "RIBONANZA_NET_DIR"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(external.ExternalToolUnavailable):
        external.run_grnade(__file__.replace(".py", ".pdb")
                            if False else "/root/reference/inference/examples/4oqu.pdb")
    with pytest.raises(external.ExternalToolUnavailable):
        external.run_ribonanza_net_secondary_structure("ACGU")


# ---------------------------------------------------------------------------
# Full monomer-RNA protocol, external stages mocked
# ---------------------------------------------------------------------------

REF_SS = "((((....))))"
REF_SEQ = "GGGGAAAACCCC"


def _write_ref_pdb(path, n=12):
    """Minimal RNA PDB with one C1' atom per residue on a helix-ish curve."""
    lines = []
    serial = 1
    for i in range(n):
        x, y, z = np.cos(i * 0.6) * 9, np.sin(i * 0.6) * 9, i * 2.8
        lines.append(
            f"ATOM  {serial:5d}  C1'   G A{i + 1:4d}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C")
        serial += 1
    open(path, "w").write("\n".join(lines) + "\nEND\n")


def test_monomer_rna_protocol_end_to_end(tmp_path, monkeypatch):
    ref_pdb = str(tmp_path / "rna1.pdb")
    _write_ref_pdb(ref_pdb)

    monkeypatch.setattr(
        external, "run_dssr",
        lambda p: {"sequence": REF_SEQ, "secondary_structure": REF_SS})
    monkeypatch.setattr(
        external, "run_eternafold",
        lambda s: {"predicted_secondary_structure": REF_SS})
    monkeypatch.setattr(
        external, "run_ribonanza_net_secondary_structure",
        lambda s: {"predicted_secondary_structures": [REF_SS, REF_SS]})
    monkeypatch.setattr(
        external, "run_ribonanza_net_reactivity_profile",
        lambda s: {"predicted_2A3_reactivity_profiles":
                   [(np.asarray([c == "." for c in REF_SS], float)).tolist()],
                   "predicted_DMS_reactivity_profiles":
                   [[0.1] * len(REF_SS)]})

    def fake_af3(name, sequence, output_directory, af3_cmd=None):
        path = os.path.join(output_directory, f"{name}_af3.pdb")
        _write_ref_pdb(path, n=len(sequence))
        return {"predicted_structure_path": path, "ptm": 0.9,
                "pae": 3.0, "plddt": 85.0}

    monkeypatch.setattr(external, "run_alphafold3", fake_af3)

    out = tmp_path / "eval"
    # 1. process the reference
    ref_json = harness.process_reference_monomer_rna(ref_pdb, str(out / "refs"))
    ref = json.load(open(ref_json))
    assert ref["dssr"]["sequence"] == REF_SEQ

    # 2. a design JSON (as design_nucleic_acid_sequence would emit)
    design = {"name": "rna1_0", "design_sequence": "GGGGAAAACCCC",
              "design_method": "na_mpnn"}
    design_path = str(tmp_path / "rna1_0.json")
    json.dump(design, open(design_path, "w"))

    # 3. process the design
    subj_json = harness.process_design_monomer_rna(design_path,
                                                   str(out / "designs"))
    subj = json.load(open(subj_json))
    assert subj["eternafold"]["predicted_secondary_structure"] == REF_SS
    assert subj["alphafold3"]["ptm"] == 0.9

    # 4. score it
    score_json = harness.score_design_monomer_rna(ref_json, subj_json,
                                                  str(out / "scores"))
    score = json.load(open(score_json))
    assert score["sequence_recovery"] == 1.0
    assert score["eternafold_f1_score_pairs"] == 1.0
    assert score["ribonanza_net_f1_score_pairs"] == 1.0
    assert score["alphafold3_c1_prime_rmsd"] < 1e-6      # identical coords
    assert score["alphafold3_c1_prime_lddt"] > 0.99
    assert score["alphafold3_ptm"] == 0.9
    assert "ribonanza_net_openknot_score" in score


def test_monomer_rna_score_trims_shorter_subject(tmp_path, monkeypatch):
    """Subject 2 residues shorter: best-RMSD window is found, pairs leaving
    the window become loops (reference na_eval_utils.py:3160-3227)."""
    ref_pdb = str(tmp_path / "rna2.pdb")
    _write_ref_pdb(ref_pdb, n=12)
    monkeypatch.setattr(
        external, "run_dssr",
        lambda p: {"sequence": REF_SEQ, "secondary_structure": REF_SS})
    ref_json = harness.process_reference_monomer_rna(ref_pdb, str(tmp_path / "r"))

    sub_pdb = str(tmp_path / "sub.pdb")
    # subject = residues 2..11 of the reference helix (n=12 curve minus ends)
    lines = [ln for ln in open(ref_pdb).read().splitlines()
             if ln.startswith("ATOM")][1:11]
    open(sub_pdb, "w").write("\n".join(lines) + "\nEND\n")

    subj = {"name": "rna2_0", "sequence": REF_SEQ[1:11],
            "eternafold": {"predicted_secondary_structure": ".(((...)))"[:10]},
            "alphafold3": {"predicted_structure_path": sub_pdb}}
    subj_path = str(tmp_path / "rna2_0.json")
    json.dump(subj, open(subj_path, "w"))

    score_json = harness.score_design_monomer_rna(ref_json, subj_path,
                                                  str(tmp_path / "s"))
    score = json.load(open(score_json))
    assert score["best_start_idx"] == 1 and score["best_end_idx"] == 11
    assert score["sequence_recovery"] == 1.0
    assert score["alphafold3_c1_prime_rmsd"] < 1e-6


def test_dispatcher_has_reference_function_set():
    for fn in ["design_nucleic_acid_sequence", "process_reference_monomer_rna",
               "process_design_monomer_rna", "score_design_monomer_rna",
               "predict_nucleic_acid_ppm", "score_specificity_prediction"]:
        assert fn in harness.FUNCTIONS


def test_dataset_statistics_and_score_summary(tmp_path):
    """Dataset-stats + score-summary visualization equivalents (reference
    plot_dataset_statistics / plot_experimental_results notebooks)."""
    import pandas as pd
    from na_mpnn_tpu.eval.visualize import dataset_statistics, summarize_scores

    scan = tmp_path / "scan.csv"
    pd.DataFrame({
        "label": ["a", "b"],
        "poly_type": ["['polypeptide(L)', 'polyribonucleotide']",
                      "['polydeoxyribonucleotide']"],
        "method": ["X-RAY_DIFFRACTION", "ELECTRON_MICROSCOPY"],
        "resolution": [2.0, 3.4],
        "coverage": [0.9, 0.8],
        "num_heavy": [1000, 2000],
    }).to_csv(scan, index=False)
    out_png = tmp_path / "stats.png"
    s = dataset_statistics(str(scan), str(out_png))
    assert s["num_structures"] == 2
    assert s["polymer_type_counts"]["polypeptide(L)"] == 1
    assert s["median_resolution"] == 2.7
    assert out_png.exists()

    for i, rec in enumerate([0.5, 0.7]):
        json.dump({"name": f"d{i}", "sequence_recovery": rec,
                   "eternafold_f1_score_pairs": 1.0 - rec},
                  open(tmp_path / f"score_{i}.json", "w"))
    df, summary = summarize_scores(str(tmp_path / "score_*.json"))
    assert len(df) == 2
    assert summary.loc["sequence_recovery", "mean"] == 0.6
    assert summary.loc["sequence_recovery", "count"] == 2


def test_experimental_results_summary(tmp_path):
    """OpenKnotBench-style experimental-results loading + per-method stats
    (reference plot_experimental_results.ipynb: design_seq slicing,
    reactivity vectors, per-method score boxplot)."""
    import pandas as pd
    from na_mpnn_tpu.eval.visualize import (experimental_results_summary,
                                            load_experimental_results)

    csv = tmp_path / "openknot.csv"
    pd.DataFrame({
        "method": ["WT", "MPNN-fixbb", "MPNN-fixbb", "gRNAde"],
        "round": [1, 1, 1, 2],
        "target_openknot_score": [40.0, 80.0, 90.0, 60.0],
        "sequence": ["GGAACCUU"] * 4,
        "sub_start": [2, 2, 3, 1],
        "sub_end": [5, 5, 6, 8],
        "reactivity_0001": [0.1] * 4,
        "reactivity_0002": [0.2] * 4,
        "reactivity_0003": [0.3] * 4,
        "reactivity_error_0001": [9.0] * 4,
    }).to_csv(csv, index=False)

    df = load_experimental_results(str(csv))
    assert df["design_seq"].tolist() == ["GAAC", "GAAC", "AACC", "GGAACCUU"]
    # error columns excluded; vector sliced by sub_start (clipped to len 3)
    np.testing.assert_allclose(df["reactivity_vec"].iloc[0], [0.2, 0.3])

    out_png = tmp_path / "box.png"
    summary = experimental_results_summary(
        str(csv), methods=["WT", "MPNN-fixbb"], rounds=[1],
        out_path=str(out_png))
    assert out_png.exists()
    row = summary[summary["method"] == "MPNN-fixbb"].iloc[0]
    assert row["count"] == 2 and row["median"] == 85.0


def test_parse_dssr_output_structured():
    text = """\
Some preamble
****************************************************************************
Secondary structures in dot-bracket notation (dbn) as a whole and per chain
>4oqu nts=12 [whole]
GGGGAAAACCCC
((((....))))
****************************************************************************
"""
    seq, ss = external.parse_dssr_output(text)
    assert seq == "GGGGAAAACCCC" and ss == "((((....))))"
    with pytest.raises(RuntimeError):
        external.parse_dssr_output("no structure here")


def test_parse_design_fasta_header_mixed_delimiters():
    h = ("4oqu, id=3, T=0.1, seed=7, overall_confidence=0.8123 seq_rec=0.4321")
    meta = harness.parse_design_fasta_header(h)
    assert meta["id"] == "3"
    assert meta["seq_rec"] == "0.4321"
    assert meta["overall_confidence"] == "0.8123"
    assert meta["T"] == "0.1"


def test_shard_helper_ranges():
    """scripts/_shard.sh computes the same array chunking as the reference
    scripts (reference design_sequences.sh:41-56)."""
    import subprocess
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "_shard.sh")
    out = subprocess.run(
        ["bash", "-c",
         f"source {script}; "
         "SLURM_ARRAY_TASK_ID=2 SLURM_ARRAY_TASK_COUNT=4 shard_range 10; "
         "echo $START_IDX $END_IDX; "
         "unset SLURM_ARRAY_TASK_ID SLURM_ARRAY_TASK_COUNT; shard_range 7; "
         "echo $START_IDX $END_IDX"],
        capture_output=True, text=True, check=True)
    lines = out.stdout.strip().splitlines()
    assert lines[0] == "6 8"      # task 2 of 4 over 10 items (chunk=3)
    assert lines[1] == "0 6"      # single-task fallback covers everything


def test_csv_column_helper(tmp_path):
    import subprocess
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "_shard.sh")
    csv = tmp_path / "x.csv"
    csv.write_text("structure_path,other\n/a.pdb,1\n/b.pdb,2\n")
    out = subprocess.run(
        ["bash", "-c", f"source {script}; csv_column {csv} structure_path"],
        capture_output=True, text=True, check=True)
    assert out.stdout.split() == ["/a.pdb", "/b.pdb"]
