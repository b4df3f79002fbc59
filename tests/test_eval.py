"""Eval scoring parity vs the reference na_eval_utils module (importable —
its top-level pulls only stdlib+numpy+pandas)."""
import numpy as np
import pytest

from na_mpnn_tpu.eval import scoring
from na_mpnn_tpu.eval.superimpose import (gdt, kabsch_superimpose, lddt,
                                          superimposed_rmsd)

from ref_oracle import load_ref_module


@pytest.fixture(scope="module")
def ref_eval():
    return load_ref_module("evaluation/na_eval_utils.py", "ref_na_eval_utils")


def test_sequence_recovery_parity(ref_eval):
    ref = "ACGUACGUAXGU"
    sub = "ACGUUCGUACGU"
    mine = scoring.calculate_sequence_recovery(
        ref, sub, unknown_residue_allowed_in_reference=True)
    theirs = ref_eval.calculate_sequence_recovery(
        ref, sub, unknown_residue_allowed_in_reference=True)
    assert mine == theirs
    # chain-break handling
    mine = scoring.calculate_sequence_recovery(
        "ACG/UAC", "ACG/AAC", chain_breaks_allowed=True)
    theirs = ref_eval.calculate_sequence_recovery(
        "ACG/UAC", "ACG/AAC", chain_breaks_allowed=True)
    assert mine == theirs
    with pytest.raises(ValueError):
        scoring.calculate_sequence_recovery("ACG", "AC")


def test_secondary_structure_parity(ref_eval):
    ss_ref = "((..[[..))..]]."
    ss_sub = "((..((..))..))."
    p1, l1 = scoring.base_pairs_and_loops(ss_ref)
    p2, l2 = ref_eval.calculate_base_pairs_and_loops_from_secondary_structure(ss_ref)
    assert sorted(p1) == sorted(p2) and l1 == l2
    mine = scoring.calculate_secondary_structure_stats(ss_ref, ss_sub)
    theirs = ref_eval.calculate_secondary_structure_stats(ss_ref, ss_sub)
    assert mine == theirs
    for bad in ["(()", "().)", "(a)"]:
        with pytest.raises(ValueError):
            scoring.base_pairs_and_loops(bad)
        with pytest.raises(ValueError):
            ref_eval.calculate_base_pairs_and_loops_from_secondary_structure(bad)


def test_standardize_parity(ref_eval):
    s = "bdhuy"
    assert scoring.standardize_rna_sequence(s, method="na_mpnn") == \
        ref_eval.standardize_rna_sequence(s, method="na_mpnn")
    s2 = "AC?gu&AC"
    assert scoring.standardize_rna_sequence(s2, method="dssr") == \
        ref_eval.standardize_rna_sequence(s2, method="dssr")
    ss = "((?..))&."
    assert scoring.standardize_secondary_structure(
        ss, method="dssr", replace_unknown_restypes=True,
        remove_chain_breaks=True) == ref_eval.standardize_secondary_structure(
        ss, method="dssr", replace_unknown_restypes=True,
        remove_chain_breaks=True)


def test_ppm_metrics_parity(ref_eval):
    rng = np.random.RandomState(0)
    a = rng.dirichlet(np.ones(4), size=12)
    b = rng.dirichlet(np.ones(4), size=12)
    for mine_fn, ref_fn in [
        (scoring.calculate_ppm_mean_absolute_error,
         ref_eval.calculate_ppm_mean_absolute_error),
        (scoring.calculate_ppm_root_mean_squared_error,
         ref_eval.calculate_ppm_root_mean_squared_error),
        (scoring.calculate_ppm_cross_entropy,
         ref_eval.calculate_ppm_cross_entropy),
    ]:
        m, t = mine_fn(a, b), ref_fn(a, b)
        assert list(m.values())[0] == pytest.approx(list(t.values())[0])


def test_align_ppms_parity(ref_eval):
    """Full eval-side PPM alignment against the reference implementation on a
    synthetic DNA complex with a planted motif."""
    from na_mpnn_tpu import constants
    rng = np.random.RandomState(3)
    table = constants.restype_to_int_table(True)
    L = 30
    S = np.concatenate([
        rng.randint(0, 20, size=10),                      # protein chain
        table["DA"] + rng.randint(0, 4, size=20),         # dna chain
    ]).astype(np.int64)
    chain_labels = np.array([0] * 10 + [1] * 20, np.int32)
    protein_mask = np.array([1] * 10 + [0] * 20, np.int32)
    dna_mask = 1 - protein_mask
    rna_mask = np.zeros(L, np.int32)
    # a sharp motif PPM matching S[12:20]
    motif = np.full((8, 4), 0.02)
    for k in range(8):
        motif[k, int(S[12 + k]) - table["DA"]] = 0.94
    ppms = [(motif, "dna"), (np.flip(np.flip(motif, 1), 0).copy(), "dna")]

    mine = scoring.align_ppms(ppms, S, chain_labels, protein_mask, dna_mask,
                              rna_mask)
    theirs = ref_eval.align_ppms(ppms, S, chain_labels, protein_mask, dna_mask,
                                 rna_mask)
    np.testing.assert_allclose(mine[0], theirs[0], atol=1e-12)
    np.testing.assert_array_equal(mine[1], theirs[1])
    assert mine[2] == pytest.approx(theirs[2])  # alignment_score_dna
    assert mine[3] == theirs[3]                 # aligned_dna_length
    assert mine[1].sum() > 0


def test_superimpose_metrics():
    rng = np.random.RandomState(1)
    ref = rng.randn(40, 3) * 8
    # rigid transform + small noise
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    sub = ref @ R.T + np.array([5.0, -3.0, 2.0]) + rng.randn(40, 3) * 0.05
    assert superimposed_rmsd(ref, sub) < 0.15
    assert lddt(ref, sub) > 0.95
    assert gdt(ref, sub) > 0.99
    moved, _ = kabsch_superimpose(ref, sub)
    assert np.abs(moved - ref).max() < 0.3
    # degraded structure scores lower
    bad = sub + rng.randn(40, 3) * 3
    assert lddt(ref, bad) < lddt(ref, sub)


def test_reactivity_profile_score():
    ss = "((((....))))"
    # ideal reactivity: unreactive at pairs, reactive at loops
    ideal = np.array([0.1] * 4 + [0.9] * 4 + [0.1] * 4)
    res = scoring.calculate_reactivity_profile_score(ss, ideal)
    assert res["eternafold_class_score"] == 100.0
    assert res["openknot_score"] == 1.0
    worst = 1.0 - ideal
    res2 = scoring.calculate_reactivity_profile_score(ss, worst)
    assert res2["eternafold_class_score"] == 0.0
