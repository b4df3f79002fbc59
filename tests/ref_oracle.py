"""Load the reference (PyTorch) NA-MPNN as a test oracle.

The reference code at /root/reference is used ONLY as a runtime oracle for
parity tests — no code is copied. Its trained checkpoints are absent from the
snapshot (.MISSING_LARGE_BLOBS), so parity is established by randomly
initializing the reference model, importing those weights into the JAX model,
and comparing activations.
"""
import importlib.util
import os
import sys

import numpy as np

REFERENCE_DIR = "/root/reference"


class ref_double_mode:
    """Run the reference model in true float64.

    The reference hard-casts intermediates with ``.float()`` (e.g.
    PositionalEncodings, na_model_utils.py:346) and allocates helpers with the
    default dtype, which breaks ``model.double()``; for the float64 oracle we
    set the torch default dtype to float64 and redirect ``Tensor.float`` to
    float64 within this scope.
    """

    def __enter__(self):
        import torch
        self._torch = torch
        self._prev_default = torch.get_default_dtype()
        self._prev_float = torch.Tensor.float
        torch.set_default_dtype(torch.float64)
        torch.Tensor.float = lambda self_, *a, **k: self_.to(torch.float64)

        # Redirect explicit float32 allocations (e.g. the sampling-prob
        # buffers, inference/model_utils.py:151-155) to float64.
        def _wrap(fn):
            def inner(*args, **kwargs):
                if kwargs.get("dtype") == torch.float32:
                    kwargs["dtype"] = torch.float64
                return fn(*args, **kwargs)
            return inner
        self._prev_fns = {n: getattr(torch, n) for n in ("zeros", "ones", "randn")}
        for n, fn in self._prev_fns.items():
            setattr(torch, n, _wrap(fn))
        return self

    def __exit__(self, *a):
        self._torch.set_default_dtype(self._prev_default)
        self._torch.Tensor.float = self._prev_float
        for n, fn in self._prev_fns.items():
            setattr(self._torch, n, fn)
        return False


class null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def load_ref_module(relpath, name):
    path = os.path.join(REFERENCE_DIR, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_hb_data_class():
    """Extract the reference HB_data class (the H-bond / base-pair oracle)
    from data/preprocess_dataset.py via AST — the module itself cannot be
    imported (it reads hardcoded paths and imports openbabel at import time).
    """
    import ast

    import numpy as np
    import torch

    path = os.path.join(REFERENCE_DIR, "data/preprocess_dataset.py")
    src = open(path).read()
    tree = ast.parse(src)
    cls = next(n for n in tree.body
               if isinstance(n, ast.ClassDef) and n.name == "HB_data")
    mod = ast.Module(body=[cls], type_ignores=[])
    ns = {"torch": torch, "np": np, "HB_data": None}
    exec(compile(mod, path, "exec"), ns)  # noqa: S102 — test oracle only
    return ns["HB_data"]


def make_ref_inference_model(seed=0, k_neighbors=32, hidden=128, dtype="float32"):
    """Randomly-initialized reference inference ProteinMPNN
    (/root/reference/inference/model_utils.py)."""
    import torch
    from na_mpnn_tpu import constants

    ref = load_ref_module("inference/model_utils.py", "ref_inference_model_utils")
    torch.manual_seed(seed)
    model = ref.ProteinMPNN(
        node_features=hidden, edge_features=hidden, hidden_dim=hidden,
        num_encoder_layers=3, num_decoder_layers=3, k_neighbors=k_neighbors,
        model_type="na_mpnn", vocab=constants.VOCAB_SIZE,
        num_letters=constants.NUM_LETTERS, augment_eps=0.0, dropout=0.0,
        atom_dict=dict(constants.ATOM_DICT),
        restype_to_int=constants.restype_to_int_table(na_shared_tokens=True),
        polytype_to_int=dict(constants.POLYTYPE_TO_INT),
    )
    model.eval()
    if dtype == "float64":
        model = model.double()
    return model


def make_ref_training_model(seed=0, k_neighbors=32, hidden=128, dtype="float32"):
    """Randomly-initialized reference training ProteinMPNN
    (/root/reference/na_model_utils.py)."""
    import torch
    from na_mpnn_tpu import constants

    ref = load_ref_module("na_model_utils.py", "ref_na_model_utils")
    torch.manual_seed(seed)
    model = ref.ProteinMPNN(
        node_features=hidden, edge_features=hidden, hidden_dim=hidden,
        num_encoder_layers=3, num_decoder_layers=3, k_neighbors=k_neighbors,
        vocab=constants.VOCAB_SIZE, num_letters=constants.NUM_LETTERS,
        protein_augment_eps=0.0, dna_augment_eps=0.0, rna_augment_eps=0.0,
        dropout=0.0, decode_protein_first=0,
        atom_dict=dict(constants.ATOM_DICT),
        restype_to_int=constants.restype_to_int_table(na_shared_tokens=True),
        polytype_to_int=dict(constants.POLYTYPE_TO_INT),
    )
    model.eval()
    if dtype == "float64":
        model = model.double()
    return model


def make_synthetic_structure(L=64, seed=1, n_protein=32, n_dna=20, two_chains=True):
    """Random but geometrically plausible mixed protein/DNA/RNA structure.

    Returns a dict of numpy arrays matching the model feature contract:
    X [1,L,16,3], X_m, mask, S, R_idx, chain_labels, protein/dna/rna masks,
    R_polymer_type.
    """
    from na_mpnn_tpu import constants

    rng = np.random.RandomState(seed)
    n_rna = L - n_protein - n_dna
    assert n_rna >= 0

    protein_mask = np.zeros(L, np.int32)
    dna_mask = np.zeros(L, np.int32)
    rna_mask = np.zeros(L, np.int32)
    protein_mask[:n_protein] = 1
    dna_mask[n_protein:n_protein + n_dna] = 1
    rna_mask[n_protein + n_dna:] = 1

    # Random-walk backbone: consecutive residue centers ~4-6 Å apart.
    steps = rng.randn(L, 3)
    steps = 5.0 * steps / np.linalg.norm(steps, axis=-1, keepdims=True)
    centers = np.cumsum(steps, axis=0).astype(np.float32)

    X = np.zeros([L, constants.NUM_BACKBONE_ATOMS, 3], np.float32)
    X_m = np.zeros([L, constants.NUM_BACKBONE_ATOMS], np.int32)
    ad = constants.ATOM_DICT
    for i in range(L):
        if protein_mask[i]:
            atoms = constants.PROTEIN_BACKBONE_ATOMS
        elif dna_mask[i]:
            atoms = constants.DNA_BACKBONE_ATOMS
        else:
            atoms = constants.RNA_BACKBONE_ATOMS
        for a in atoms:
            X[i, ad[a]] = centers[i] + rng.randn(3).astype(np.float32) * 1.2
            X_m[i, ad[a]] = 1
    # Knock out a few non-reference atoms to exercise atom masking.
    for i in rng.choice(L, size=L // 8, replace=False):
        if protein_mask[i]:
            X_m[i, ad["O"]] = 0
        else:
            X_m[i, ad["OP1"]] = 0

    table = constants.restype_to_int_table(True)
    S = np.zeros(L, np.int64)
    for i in range(L):
        if protein_mask[i]:
            S[i] = rng.randint(0, 20)
        elif dna_mask[i]:
            S[i] = table["DA"] + rng.randint(0, 4)
        else:
            S[i] = table["DA"] + rng.randint(0, 4)  # shared tokens

    chain_labels = np.zeros(L, np.int64)
    if two_chains:
        chain_labels[n_protein:] = 1
    R_idx = np.zeros(L, np.int32)
    R_idx[:n_protein] = np.arange(n_protein) + 1
    R_idx[n_protein:] = np.arange(L - n_protein) + 1

    pt = constants.POLYTYPE_TO_INT
    R_polymer_type = (protein_mask * pt["PP"] + dna_mask * pt["DNA"]
                      + rna_mask * pt["RNA"]).astype(np.int64)

    return {
        "X": X[None], "X_m": X_m[None], "mask": np.ones([1, L], np.int32),
        "S": S[None], "R_idx": R_idx[None], "chain_labels": chain_labels[None],
        "protein_mask": protein_mask[None], "dna_mask": dna_mask[None],
        "rna_mask": rna_mask[None], "R_polymer_type": R_polymer_type[None],
    }


def to_torch_feature_dict(batch, dtype="float32"):
    import torch
    fd = {}
    for k, v in batch.items():
        t = torch.from_numpy(np.asarray(v))
        if t.dtype == torch.float32 and dtype == "float64":
            t = t.double()
        fd[k] = t
    fd["S"] = fd["S"].long()
    fd["R_polymer_type"] = fd["R_polymer_type"].long()
    fd["chain_labels"] = fd["chain_labels"].long()
    return fd
