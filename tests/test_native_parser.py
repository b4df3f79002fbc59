"""Native C++ parser parity vs the pure-Python path on real structures."""
import time

import numpy as np
import pytest

from na_mpnn_tpu.data.native_loader import native_available, read_pdb_atoms_native
from na_mpnn_tpu.data.pdb import parse_pdb, read_pdb_atoms

EXAMPLES = "/root/reference/inference/examples"

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native parser unavailable (no g++?)")


@pytest.mark.parametrize("name", ["4oqu", "1am9"])
def test_atom_record_parity(name):
    path = f"{EXAMPLES}/{name}.pdb"
    py = read_pdb_atoms(path, use_native=False)
    nat = read_pdb_atoms_native(path)
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert (a.name, a.resname, a.chain, a.resnum, a.icode, a.altloc,
                a.element) == (b.name, b.resname, b.chain, b.resnum, b.icode,
                               b.altloc, b.element)
        np.testing.assert_allclose(a.xyz, b.xyz, atol=1e-4)
        assert a.occupancy == pytest.approx(b.occupancy)
        assert a.bfactor == pytest.approx(b.bfactor)


def test_full_parse_identical_features():
    """parse_pdb built on the native reader produces identical model inputs."""
    p_native = parse_pdb(f"{EXAMPLES}/1am9.pdb")  # native path (default)
    import na_mpnn_tpu.data.pdb as pdb_mod
    orig = pdb_mod.read_pdb_atoms
    try:
        pdb_mod.read_pdb_atoms = lambda path, fmo=True, use_native=True: \
            orig(path, fmo, use_native=False)
        p_py = parse_pdb(f"{EXAMPLES}/1am9.pdb")
    finally:
        pdb_mod.read_pdb_atoms = orig
    for k in ["X", "X_m", "mask", "S", "R_idx", "chain_labels", "protein_mask",
              "dna_mask", "rna_mask", "R_polymer_type", "xyz_65", "xyz_65_m"]:
        np.testing.assert_array_equal(np.asarray(p_native[k]), np.asarray(p_py[k]),
                                      err_msg=k)


def test_native_parser_speed():
    path = f"{EXAMPLES}/1am9.pdb"
    read_pdb_atoms_native(path)  # warm the build
    t0 = time.perf_counter()
    for _ in range(5):
        nat = read_pdb_atoms_native(path)
    t_native = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        py = read_pdb_atoms(path, use_native=False)
    t_py = (time.perf_counter() - t0) / 5
    assert len(nat) == len(py)
    # informative, not strict: the native tokenizer should not be slower
    print(f"native {t_native*1e3:.1f} ms vs python {t_py*1e3:.1f} ms")
    assert t_native < t_py * 1.5
