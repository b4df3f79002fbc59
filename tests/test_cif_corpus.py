"""CIF-corpus robustness: synthetic mmCIF variants exercising the corner
cases real RCSB entries contain (multi-model NMR, altlocs, '?'/'.' fields,
semicolon multiline values, quoted strings, gzip, covalent links) against
the training-side parser (role of reference cifutils.CIFParser.parse,
cifutils.py:380-817)."""
import gzip

import numpy as np

from na_mpnn_tpu.data.cif import CIFParser, read_cif

HEADER = """data_TEST
#
_exptl.method '{method}'
#
loop_
_entity_poly.entity_id
_entity_poly.type
_entity_poly.pdbx_seq_one_letter_code_can
1 polypeptide(L) GG
#
loop_
_pdbx_poly_seq_scheme.asym_id
_pdbx_poly_seq_scheme.entity_id
_pdbx_poly_seq_scheme.seq_id
A 1 1
A 1 2
#
"""

ATOM_COLS = """loop_
_atom_site.group_PDB
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_seq_id
_atom_site.auth_seq_id
_atom_site.label_alt_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.B_iso_or_equiv
_atom_site.pdbx_PDB_model_num
"""

BACKBONE = [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O")]


def _atom_rows(model=1, alt=".", occ="1.0", bfac="10.0", x_off=0.0):
    rows = []
    for seq in (1, 2):
        for name, sym in BACKBONE:
            rows.append(f"ATOM {sym} {name} GLY A {seq} {seq} {alt} "
                        f"{x_off + seq:.1f} {len(rows):.1f} 0.0 "
                        f"{occ} {bfac} {model}")
    return rows


def _write(tmp_path, name, text):
    p = tmp_path / name
    if name.endswith(".gz"):
        with gzip.open(p, "wt") as f:
            f.write(text)
    else:
        p.write_text(text)
    return str(p)


def test_nmr_first_model_default(tmp_path):
    """Multi-model entries load exactly one model; without randomization it
    is the first (reference model-selection semantics)."""
    rows = []
    for m in (1, 2, 3):
        rows += _atom_rows(model=m, x_off=100.0 * (m - 1))
    cif = HEADER.format(method="SOLUTION NMR") + ATOM_COLS + "\n".join(rows)
    chains, _, _, meta = CIFParser().parse(_write(tmp_path, "t.cif", cif))
    atoms = chains["A"].atoms
    assert len(atoms) == 8  # one model's worth, not 24
    xs = np.array([a.xyz[0] for a in atoms.values()])
    assert xs.max() < 100.0  # model 1 coordinates
    assert meta["method"] == "SOLUTION_NMR"


def test_nmr_randomized_model_is_consistent(tmp_path):
    """randomize_nmr_model picks ONE whole model (never mixes models)."""
    rows = []
    for m in (1, 2, 3):
        rows += _atom_rows(model=m, x_off=100.0 * (m - 1))
    cif = HEADER.format(method="SOLUTION NMR") + ATOM_COLS + "\n".join(rows)
    path = _write(tmp_path, "t.cif", cif)
    picked = set()
    for seed in range(8):
        parser = CIFParser(randomize_nmr_model=True,
                           rng=np.random.RandomState(seed))
        chains, _, _, _ = parser.parse(path)
        xs = np.array([a.xyz[0] for a in chains["A"].atoms.values()])
        offs = set(np.floor(xs / 100.0).astype(int))
        assert len(offs) == 1  # a single model's offset throughout
        picked |= offs
    assert len(picked) > 1  # different seeds reach different models


def test_altloc_b_skipped_higher_occ_wins(tmp_path):
    """Only '.'/'A' altlocs load; duplicate atom records keep the
    higher-occupancy copy."""
    rows = _atom_rows(alt="A", occ="0.4")
    rows += _atom_rows(alt="B", occ="0.6", x_off=50.0)   # skipped entirely
    rows += [r for r in _atom_rows(alt="A", occ="0.7", x_off=7.0)
             if " CA " in r]                              # higher-occ dupes
    cif = HEADER.format(method="X-RAY DIFFRACTION") + ATOM_COLS + "\n".join(rows)
    chains, _, _, _ = CIFParser().parse(_write(tmp_path, "t.cif", cif))
    atoms = chains["A"].atoms
    assert len(atoms) == 8
    for key, a in atoms.items():
        if key[3] == "CA":
            assert a.occ == 0.7 and a.xyz[0] >= 7.0
        else:
            assert a.occ == 0.4 and a.xyz[0] < 10.0


def test_missing_occupancy_and_bfactor_tokens(tmp_path):
    """'?' / '.' occupancy and B-factor fields parse (real entries contain
    them) with 1.0 / 0.0 defaults."""
    rows = _atom_rows(occ="?", bfac=".")
    cif = HEADER.format(method="X-RAY DIFFRACTION") + ATOM_COLS + "\n".join(rows)
    chains, _, _, _ = CIFParser().parse(_write(tmp_path, "t.cif", cif))
    atoms = chains["A"].atoms
    assert len(atoms) == 8
    assert all(a.occ == 1.0 and a.bfac == 0.0 for a in atoms.values())


def test_semicolon_multiline_sequence_and_gzip(tmp_path):
    """Semicolon-delimited multiline values and .cif.gz input both parse;
    the entity sequence newline is stripped."""
    head = (
        "data_TEST\n#\n_exptl.method 'X-RAY DIFFRACTION'\n#\n"
        "loop_\n_entity_poly.entity_id\n_entity_poly.type\n"
        "_entity_poly.pdbx_seq_one_letter_code_can\n"
        "1 polypeptide(L)\n;GG\n;\n#\n"
        "loop_\n_pdbx_poly_seq_scheme.asym_id\n"
        "_pdbx_poly_seq_scheme.entity_id\n_pdbx_poly_seq_scheme.seq_id\n"
        "A 1 1\nA 1 2\n#\n"
    )
    cif = head + ATOM_COLS + "\n".join(_atom_rows())
    for name in ("t.cif", "t.cif.gz"):
        chains, asmb, _, _ = CIFParser().parse(_write(tmp_path, name, cif))
        assert chains["A"].sequence == "GG"
        assert len(chains["A"].atoms) == 8
        # no assembly tables -> identity assembly over all chains
        assert list(asmb) == ["1"]
        assert np.allclose(asmb["1"][0][1], np.eye(4))


def test_covale_links_extracted(tmp_path):
    """struct_conn covale rows surface as atom-key pairs; other conn types
    (metalc, disulf) are ignored."""
    conn = (
        "#\nloop_\n_struct_conn.id\n_struct_conn.conn_type_id\n"
        "_struct_conn.ptnr1_label_asym_id\n_struct_conn.ptnr1_label_seq_id\n"
        "_struct_conn.ptnr1_label_comp_id\n_struct_conn.ptnr1_label_atom_id\n"
        "_struct_conn.ptnr2_label_asym_id\n_struct_conn.ptnr2_label_seq_id\n"
        "_struct_conn.ptnr2_label_comp_id\n_struct_conn.ptnr2_label_atom_id\n"
        "c1 covale A 1 GLY C A 2 GLY N\n"
        "m1 metalc A 1 GLY O A 2 GLY N\n"
    )
    cif = (HEADER.format(method="X-RAY DIFFRACTION") + ATOM_COLS
           + "\n".join(_atom_rows()) + "\n" + conn)
    _, _, covale, _ = CIFParser().parse(_write(tmp_path, "t.cif", cif))
    assert covale == [(("A", "1", "GLY", "C"), ("A", "2", "GLY", "N"))]


def test_read_cif_quoted_tokens_and_comments(tmp_path):
    """Quoted tokens keep internal spaces/#; trailing comments are dropped."""
    text = (
        "data_X\n"
        "_meta.a 'two words' # trailing comment\n"
        "loop_\n_tab.p\n_tab.q\n"
        '"a b" c#notcomment\n'
        "d 'e#f'\n"
    )
    tables = read_cif(_write(tmp_path, "q.cif", text))
    assert tables["meta"].get(0, "a") == "two words"
    assert tables["tab"].rows == [["a b", "c#notcomment"], ["d", "e#f"]]
