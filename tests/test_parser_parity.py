"""Parser-level parity: the reference inference parser (parse_PDB,
/root/reference/inference/data_utils.py:84-405) is run VERBATIM as an oracle
— with a minimal ProDy stand-in (tests/prody_shim.py) supplying the five
ProDy calls it makes — and every tensor of its output dict is compared
exactly (to dtype) against na_mpnn_tpu.data.pdb.parse_pdb on the two example
structures the reference ships (4oqu: RNA + SAM/MG ligands; 1am9:
protein/DNA + waters)."""
import os
import sys

import numpy as np
import pytest

import prody_shim
from ref_oracle import REFERENCE_DIR, load_ref_module

from na_mpnn_tpu.data.pdb import parse_pdb

EXAMPLES = os.path.join(REFERENCE_DIR, "inference", "examples")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not available")


@pytest.fixture(scope="module")
def ref_parse_pdb():
    sys.modules["prody"] = prody_shim
    try:
        mod = load_ref_module("inference/data_utils.py", "ref_inference_data_utils")
    finally:
        del sys.modules["prody"]
    return mod.parse_PDB


# Exact-match tensor keys and their expected dtypes (the reference casts
# every array on output, inference/data_utils.py:360-399).
TENSOR_KEYS = {
    "X": np.float32, "X_m": np.int32, "mask": np.int32,
    "Y": np.float32, "Y_t": np.int32, "Y_m": None,  # bool-ish; compared as int
    "R_idx": np.int32, "chain_labels": np.int32,
    "protein_mask": np.int32, "dna_mask": np.int32, "rna_mask": np.int32,
    "rna_mask_for_token_conversion": np.int32,
    "R_polymer_type": np.int64, "S": np.int32,
    "xyz_65": np.float32, "xyz_65_m": np.int32,
}


def _compare(pdb_path, na_shared_tokens, ref_parse_pdb, **kw):
    ref_out, _backbone, _other, ref_icodes, _water = ref_parse_pdb(
        pdb_path, model_type="na_mpnn", na_shared_tokens=na_shared_tokens, **kw)
    mine = parse_pdb(pdb_path, na_shared_tokens=na_shared_tokens, **kw)

    for key, dtype in TENSOR_KEYS.items():
        ref_arr = ref_out[key].cpu().numpy()
        my_arr = np.asarray(mine[key])
        assert my_arr.shape == ref_arr.shape, (key, my_arr.shape, ref_arr.shape)
        if dtype is not None:
            assert my_arr.dtype == dtype, (key, my_arr.dtype, dtype)
        np.testing.assert_array_equal(
            my_arr.astype(np.float64), ref_arr.astype(np.float64),
            err_msg=key)

    # Python-side fields
    assert mine["chain_letters"] == list(ref_out["chain_letters"])
    assert list(mine["na_chain_letters"]) == list(ref_out["na_chain_letters"])
    assert mine["chain_list"] == ref_out["chain_list"]
    assert len(mine["mask_c"]) == len(ref_out["mask_c"])
    for m_mine, m_ref in zip(mine["mask_c"], ref_out["mask_c"]):
        np.testing.assert_array_equal(np.asarray(m_mine),
                                      m_ref.cpu().numpy())
    np.testing.assert_array_equal(np.asarray(mine["icodes"]),
                                  np.asarray(ref_icodes))


@pytest.mark.parametrize("name", ["4oqu", "1am9"])
@pytest.mark.parametrize("na_shared_tokens", [False, True])
def test_parse_pdb_parity(name, na_shared_tokens, ref_parse_pdb):
    _compare(os.path.join(EXAMPLES, f"{name}.pdb"), na_shared_tokens,
             ref_parse_pdb)


@pytest.mark.parametrize("name", ["1am9"])
def test_parse_pdb_parity_chain_subset(name, ref_parse_pdb):
    _compare(os.path.join(EXAMPLES, f"{name}.pdb"), True, ref_parse_pdb,
             chains=["A"])


def test_parse_pdb_parity_na_only(ref_parse_pdb):
    _compare(os.path.join(EXAMPLES, "1am9.pdb"), True, ref_parse_pdb,
             parse_na_only=True)


def test_parse_pdb_parity_missing_atoms_flag(ref_parse_pdb):
    _compare(os.path.join(EXAMPLES, "4oqu.pdb"), True, ref_parse_pdb,
             load_residues_with_missing_atoms=1)
