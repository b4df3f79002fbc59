"""Inference-side featurization and scoring helpers.

JAX equivalents of reference inference/data_utils.py:7-52,407-439.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def renumber_duplicate_resnums(R_idx: np.ndarray) -> np.ndarray:
    """Offset duplicated consecutive residue numbers so R_idx is strictly
    usable as a relative-position signal (reference
    inference/data_utils.py:409-417)."""
    out = []
    count = 0
    prev = -100000
    for r in list(np.asarray(R_idx)):
        if prev == r:
            count += 1
        out.append(int(r) + count)
        prev = r
    return np.array(out, dtype=np.asarray(R_idx).dtype)


def featurize_inference(parsed: Dict, chain_mask: np.ndarray,
                        pad_to: int = 0, as_numpy: bool = False) -> Dict:
    """Add batch dims + renumber R_idx -> model-ready jnp batch
    (reference inference/data_utils.py:407-439).

    pad_to > L pads every per-residue array to that length with inert rows
    (mask=0, fresh chain label, strictly-increasing R_idx), so structures of
    different lengths share one compiled executable — a TPU-side addition
    (the torch reference recompiles nothing; XLA compiles per shape).
    Padded rows are excluded from the kNN graph by the masked distance
    adjustment and from every loss/score by the mask products; callers
    truncate sampled outputs back to L.

    as_numpy=True keeps everything host-side (numpy) — batching callers
    stack many structures first and upload once, instead of paying a
    device round-trip per structure.
    """
    lib = np if as_numpy else jnp
    L = len(parsed["S"])
    pad = max(int(pad_to) - L, 0)

    def padded(a, fill=0):
        a = np.asarray(a)
        if pad == 0:
            return a
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, constant_values=fill)

    R_idx = renumber_duplicate_resnums(parsed["R_idx"])
    if pad:
        tail = R_idx[-1] + 1 + np.arange(pad, dtype=R_idx.dtype)
        R_idx = np.concatenate([R_idx, tail])
    chain_labels = np.asarray(parsed["chain_labels"])
    chain_labels = padded(chain_labels,
                          fill=int(chain_labels.max()) + 1 if pad else 0)

    batch = {}
    batch["R_idx"] = lib.asarray(R_idx)[None]
    batch["R_idx_original"] = lib.asarray(padded(parsed["R_idx"]))[None]
    batch["chain_labels"] = lib.asarray(chain_labels)[None]
    for k in ["S", "mask", "protein_mask", "dna_mask", "rna_mask",
              "rna_mask_for_token_conversion", "R_polymer_type", "X", "X_m",
              "xyz_65", "xyz_65_m"]:
        batch[k] = lib.asarray(padded(parsed[k]))[None]
    batch["chain_mask"] = lib.asarray(padded(chain_mask))[None]
    return batch


def get_seq_rec(S_true, S_pred, mask):
    """Masked sequence recovery per decode sample
    (reference inference/data_utils.py:18-30)."""
    match = (S_true == S_pred).astype(jnp.float32)
    return jnp.sum(match * mask, axis=-1) / jnp.sum(mask, axis=-1)


def get_score(S, log_probs, mask, num_letters):
    """Masked categorical cross-entropy (confidence score)
    (reference inference/data_utils.py:36-52)."""
    import jax
    S_one_hot = jax.nn.one_hot(S, num_letters, dtype=log_probs.dtype)
    loss_per_residue = -jnp.sum(S_one_hot * log_probs, axis=-1)
    average = jnp.sum(loss_per_residue * mask, axis=-1) / (jnp.sum(mask, axis=-1) + 1e-8)
    return average, loss_per_residue


def make_pair_bias_ctx(chain_labels: np.ndarray, R_idx: np.ndarray,
                       pair_bias_AA: np.ndarray, as_numpy: bool = False) -> Dict:
    """Precompute the O(L) adjacency diagonal for neighbor pair bias.

    Replaces the reference's dense [1,L,33,L,33] tensor
    (inference/data_utils.py:7-16) with its diagonal structure: u_diag[i]=1
    iff residues i,i+1 are sequence-consecutive on the same chain.
    as_numpy=True stays host-side for callers that batch many structures
    before one upload.
    """
    lib = np if as_numpy else jnp
    R_idx = np.asarray(R_idx)
    chain_labels = np.asarray(chain_labels)
    adj = ((R_idx[1:] - R_idx[:-1]) == 1) & (chain_labels[1:] == chain_labels[:-1])
    return {
        "pair_bias_AA": lib.asarray(np.asarray(pair_bias_AA, np.float32)),
        "u_diag": lib.asarray(adj.astype(np.float32)),
    }
