"""Parity tests for the offline preprocessing engine (H-bond / base-pair /
interface) against the reference HB_data oracle on real structure data
(1am9: protein-DNA complex with true base pairs)."""
import numpy as np
import pytest

from na_mpnn_tpu import constants
from na_mpnn_tpu.data.pdb import parse_pdb
from na_mpnn_tpu.data.preprocess import (base_pair_probabilities,
                                         convert_mpnn_representation,
                                         get_base_pair_mask_and_index,
                                         get_interface_masks, hbond_counts)

from ref_oracle import load_ref_hb_data_class

EXAMPLES = "/root/reference/inference/examples"


@pytest.fixture(scope="module")
def cropped_1am9():
    """1am9 cropped to the DNA duplex + nearby protein (keeps the reference
    Python-loop oracle tractable)."""
    # parse_all_atoms: the H-bond engine needs base/side-chain atoms, and the
    # xyz_65 column layout only follows constants.ALL_ATOM_ORDER in all-atom
    # mode (backbone-mode parses use the 16-atom ordering, as the reference
    # parser does; inference/data_utils.py:154-165).
    p = parse_pdb(f"{EXAMPLES}/1am9.pdb", parse_all_atoms=True)
    X = p["xyz_65"].astype(np.float32)
    X_m = p["xyz_65_m"].astype(np.int32)
    S = p["S"].astype(np.int32)
    na = (p["dna_mask"] + p["rna_mask"]).astype(bool)
    ref = X[:, constants.ALL_ATOM_ORDER["CA"], :] + X[:, constants.ALL_ATOM_ORDER["C1'"], :]
    na_center = ref[na].mean(0)
    d = np.linalg.norm(ref - na_center, axis=-1)
    keep = np.sort(np.argsort(d)[:140])
    return {
        "X": X[keep], "X_m": X_m[keep], "S": S[keep],
        "protein_mask": p["protein_mask"][keep].astype(np.int32),
        "dna_mask": p["dna_mask"][keep].astype(np.int32),
        "rna_mask": p["rna_mask"][keep].astype(np.int32),
    }


def test_hbond_and_base_pair_parity(cropped_1am9):
    import torch

    d = cropped_1am9
    atom_dict = dict(constants.ALL_ATOM_ORDER)
    S_rfaa, X_rfaa = convert_mpnn_representation(
        d["S"], d["X"], d["X_m"], d["rna_mask"], atom_dict)

    HB_data = load_ref_hb_data_class()
    hb = HB_data(torch.tensor(S_rfaa), torch.tensor(X_rfaa),
                 compute_paired_bases=True)

    counts = hbond_counts(S_rfaa, X_rfaa)
    ref_counts = hb.hbond_summation.numpy()
    assert counts.sum() > 0, "no H-bonds found in a real DNA duplex?"
    np.testing.assert_allclose(counts, ref_counts, atol=1e-5)

    probs = base_pair_probabilities(S_rfaa, X_rfaa)
    ref_probs = hb.basepairs_ij.numpy()
    # Self-pairs have degenerate geometry (Y_ij = 0) where torch/numpy
    # arccos edge behavior differs; their probs are ~3e-4, far below the 0.5
    # decision threshold, so compare off-diagonal values and the thresholded
    # matrix everywhere.
    off_diag = ~np.eye(probs.shape[0], dtype=bool)
    np.testing.assert_allclose(probs[off_diag], ref_probs[off_diag], atol=1e-4)
    np.testing.assert_array_equal(probs > 0.5, ref_probs > 0.5)
    assert (probs > 0.5).sum() > 0, "no base pairs found in a DNA duplex?"


def test_base_pair_mask_and_index(cropped_1am9):
    d = cropped_1am9
    bp_mask, bp_index, cbp_mask, cbp_index = get_base_pair_mask_and_index(
        d["S"], d["X"], d["X_m"], d["rna_mask"],
        atom_dict=dict(constants.ALL_ATOM_ORDER))
    assert bp_mask.sum() > 0
    # partner-of-partner closure
    paired = np.where(bp_mask == 1)[0]
    for i in paired:
        j = bp_index[i]
        assert bp_mask[j] == 1
    # canonical pairs are a subset and form canonical combos
    assert cbp_mask.sum() > 0
    assert np.all(cbp_mask <= bp_mask)
    combos = set(constants.canonical_base_pair_ints(True))
    for i in np.where(cbp_mask == 1)[0]:
        assert (int(d["S"][i]), int(d["S"][cbp_index[i]])) in combos
    # DNA duplex: most canonical partners should be mutual
    for i in np.where(cbp_mask == 1)[0]:
        assert cbp_index[cbp_index[i]] == i


def test_interface_masks(cropped_1am9):
    d = cropped_1am9
    interface, sc_interface, nearest_sc = get_interface_masks(
        d["X"], d["X_m"], d["protein_mask"], d["dna_mask"], d["rna_mask"],
        atom_dict=dict(constants.ALL_ATOM_ORDER))
    # A protein-DNA complex must have interface residues of both polymers.
    assert (interface * d["protein_mask"]).sum() > 0
    assert (interface * d["dna_mask"]).sum() > 0
    # side-chain interface is a subset of residues near the interface
    assert sc_interface.sum() > 0
    # nearest protein side chain indices point at protein residues
    na = (d["dna_mask"] + d["rna_mask"]).astype(bool)
    pointed = nearest_sc[na & (sc_interface == 1)]
    assert np.all(d["protein_mask"][pointed[pointed > 0]] == 1)


def test_helical_params_parity(cropped_1am9):
    """helical_params vs the reference oracle with compute_helical_params=True
    (reference data/preprocess_dataset.py:483-631) on the real DNA duplex."""
    import torch

    from na_mpnn_tpu.data.preprocess import (HELICAL_PARAM_NAMES,
                                             helical_params)

    d = cropped_1am9
    atom_dict = dict(constants.ALL_ATOM_ORDER)
    S_rfaa, X_rfaa = convert_mpnn_representation(
        d["S"], d["X"], d["X_m"], d["rna_mask"], atom_dict)

    HB_data = load_ref_hb_data_class()
    hb = HB_data(torch.tensor(S_rfaa), torch.tensor(X_rfaa),
                 compute_paired_bases=True, compute_helical_params=True)

    ours = helical_params(S_rfaa, X_rfaa)
    ref_attr = {"tilt": "tilt_i", "roll": "roll_i", "twist": "twist_i",
                "shift": "shift_i", "slide": "slide_i", "rise": "rise_i",
                "inclination": "inclination_i", "tip": "tip_i",
                "helical_twist": "helical_twist_i", "x_disp": "x_disp_i",
                "y_disp": "y_disp_i", "helical_rise": "helical_rise_i"}
    n_checked = 0
    for name in HELICAL_PARAM_NAMES:
        ref = getattr(hb, ref_attr[name]).numpy()
        v = ours[name]
        assert v.shape == ref.shape
        both = np.isfinite(ref) & np.isfinite(v)
        np.testing.assert_array_equal(np.isfinite(v), np.isfinite(ref))
        np.testing.assert_allclose(v[both], ref[both], atol=2e-4)
        n_checked += int(both.sum())
    assert n_checked > 0
    # A B-form DNA duplex twists ~0.6 rad/step on average.
    tw = ours["twist"][np.isfinite(ours["twist"]) & (ours["twist"] != 0)]
    assert tw.size > 0 and 0.2 < np.median(np.abs(tw)) < 1.2
