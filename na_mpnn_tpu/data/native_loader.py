"""ctypes bindings for the native C++ structure parser
(na_mpnn_tpu/native/na_parse.cc, shipped inside the package).

The library self-builds with g++ on first use. The .so is cached next to
the source (or under ~/.cache/na-mpnn-tpu when the package directory is
read-only) under a name keyed by the source contents, so a package upgrade
rebuilds instead of reusing a stale binary; builds write to a temp file and
os.replace into place, so concurrent first users never load a half-written
library. Every caller falls back to the pure-Python parsers when the
toolchain, a writable cache location, or the build is unavailable
(`native_available()`).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "na_parse.cc")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _lib_path() -> Optional[str]:
    """Content-hashed target path, or None when nowhere is writable."""
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    name = f"libna_parse-{tag}.so"
    if os.access(_NATIVE_DIR, os.W_OK):
        return os.path.join(_NATIVE_DIR, name)
    try:
        cache = os.path.join(os.path.expanduser("~"), ".cache", "na-mpnn-tpu")
        os.makedirs(cache, exist_ok=True)
        return os.path.join(cache, name)
    except OSError:
        return None


def _build(lib_path: str) -> bool:
    tmp = f"{lib_path}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC,
             "-lz"],
            check=True, capture_output=True)
        os.replace(tmp, lib_path)  # atomic: readers never see partial writes
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
        stderr = getattr(e, "stderr", b"")
        print("native parser build failed:",
              stderr.decode() if stderr else e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SRC):
            _build_failed = True
            return None
        lib_path = _lib_path()
        if lib_path is None or (
                not os.path.exists(lib_path) and not _build(lib_path)):
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError as e:
            print("native parser load failed:", e)
            _build_failed = True
            return None
        lib.na_parse_structure.restype = ctypes.c_void_p
        lib.na_parse_structure.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_int]
        lib.na_parse_num_atoms.restype = ctypes.c_int64
        lib.na_parse_num_atoms.argtypes = [ctypes.c_void_p]
        lib.na_parse_error.restype = ctypes.c_char_p
        lib.na_parse_error.argtypes = [ctypes.c_void_p]
        lib.na_parse_free.argtypes = [ctypes.c_void_p]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.na_parse_copy.argtypes = [ctypes.c_void_p, f32p, f32p, f32p, i32p,
                                      i32p, u8p, u8p, u8p, u8p, u8p, u8p, u8p,
                                      i32p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeAtomTable:
    """Column-oriented atom table parsed by the native library."""

    __slots__ = ["n", "xyz", "occ", "bfac", "resnum", "serial", "name",
                 "resname", "chain", "icode", "element", "altloc", "hetero",
                 "model"]

    def __init__(self, n):
        self.n = n
        self.xyz = np.empty((n, 3), np.float32)
        self.occ = np.empty(n, np.float32)
        self.bfac = np.empty(n, np.float32)
        self.resnum = np.empty(n, np.int32)
        self.serial = np.empty(n, np.int32)
        self.name = np.empty((n, 8), np.uint8)
        self.resname = np.empty((n, 8), np.uint8)
        self.chain = np.empty((n, 4), np.uint8)
        self.icode = np.empty(n, np.uint8)
        self.element = np.empty((n, 4), np.uint8)
        self.altloc = np.empty(n, np.uint8)
        self.hetero = np.empty(n, np.uint8)
        self.model = np.empty(n, np.int32)

    @staticmethod
    def _str(a):
        return a.tobytes().decode("ascii", "replace").rstrip("\x00").strip()

    def name_str(self, i):
        return self._str(self.name[i])

    def resname_str(self, i):
        return self._str(self.resname[i])

    def chain_str(self, i):
        return self._str(self.chain[i])


def parse_structure_native(path: str, first_model_only: bool = True
                           ) -> Optional[NativeAtomTable]:
    """Parse PDB/mmCIF (optionally gzipped) via the native library.
    Returns None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    is_cif = int(".cif" in os.path.basename(path))
    h = lib.na_parse_structure(path.encode(), is_cif, int(first_model_only))
    try:
        err = lib.na_parse_error(h)
        if err:
            raise IOError(f"{path}: {err.decode()}")
        n = lib.na_parse_num_atoms(h)
        t = NativeAtomTable(n)
        if n:
            lib.na_parse_copy(h, t.xyz, t.occ, t.bfac, t.resnum, t.serial,
                              t.name.reshape(-1), t.resname.reshape(-1),
                              t.chain.reshape(-1), t.icode, t.element.reshape(-1),
                              t.altloc, t.hetero, t.model)
        return t
    finally:
        lib.na_parse_free(h)


def read_pdb_atoms_native(path: str, first_model_only: bool = True) -> List:
    """Native-parser drop-in for data.pdb.read_pdb_atoms: ATOM/HETATM records
    with altloc in (' ', 'A') and occupancy > 0, as PDBAtom objects.

    The columnar->object conversion is vectorized: all filters and string
    decodes run as whole-column numpy ops, leaving only one object
    construction per surviving atom (the per-atom attribute loop was slower
    than the pure-Python line parser it replaced)."""
    from .pdb import PDBAtom

    t = parse_structure_native(path, first_model_only)
    if t is None:
        return None
    if t.n == 0:
        return []

    keep = (t.occ > 0) & ((t.altloc == 0) | (t.altloc == ord(" "))
                          | (t.altloc == ord("A")))
    if first_model_only:
        keep &= t.model == t.model[0]
    idx = np.nonzero(keep)[0]

    def decode(col):
        # fixed-width byte columns -> stripped python strings, one bulk op
        return np.char.strip(
            col[idx].view(f"S{col.shape[1]}")[:, 0].astype(str)).tolist()

    names = decode(t.name)
    resnames = decode(t.resname)
    chains = [c or " " for c in decode(t.chain)]
    elements = [e.upper() for e in decode(t.element)]
    alts = [chr(a) if a else " " for a in t.altloc[idx].tolist()]
    icodes = [chr(c).strip() if c else "" for c in t.icode[idx].tolist()]
    groups = np.where(t.hetero[idx], "HETATM", "ATOM").tolist()
    xyz = t.xyz[idx]
    serials = t.serial[idx].tolist()
    resnums = t.resnum[idx].tolist()
    occs = t.occ[idx].tolist()
    bfacs = t.bfac[idx].tolist()

    out = []
    for i in range(len(idx)):
        element = elements[i]
        if not element:
            for ch in names[i]:
                if ch.isalpha():
                    element = ch.upper()
                    break
        out.append(PDBAtom(groups[i], serials[i], names[i], alts[i],
                           resnames[i], chains[i], resnums[i], icodes[i],
                           xyz[i], occs[i], bfacs[i], element, ""))
    return out
