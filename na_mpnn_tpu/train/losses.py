"""Training losses and batch metrics.

JAX equivalents of reference na_model_utils.py:100-165:
* NLL loss + argmax accuracy (loss_nll);
* label-smoothed CE with per-polymer smoothing mass and PPM soft labels
  substituted into the one-hot target (loss_smoothed);
* canonical-base-pair accuracy via partner-index gather.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants


def loss_nll(S, log_probs, mask):
    """Per-token NLL + masked mean + argmax correctness
    (reference na_model_utils.py:100-109)."""
    loss = -jnp.take_along_axis(log_probs, S[..., None], axis=-1)[..., 0]
    S_argmax = jnp.argmax(log_probs, axis=-1)
    true_false = (S == S_argmax).astype(jnp.float32)
    loss_av = jnp.sum(loss * mask) / jnp.sum(mask)
    return loss, loss_av, true_false


def make_polymer_restype_masks(na_shared_tokens: bool = True) -> Dict[str, np.ndarray]:
    prot, dna, rna, _ = constants.restype_group_ints(na_shared_tokens)
    return {
        "protein": constants.polymer_restype_mask_array(prot),
        "dna": constants.polymer_restype_mask_array(dna),
        "rna": constants.polymer_restype_mask_array(rna),
        "nums": {"protein": float(len(prot)), "dna": float(len(dna)),
                 "rna": float(len(rna))},
    }


def loss_smoothed(S, log_probs, mask, polymer_masks, restype_masks,
                  weight=0.1, tokens=6000.0, num_letters=33,
                  ppm_mask=None, aligned_ppm=None):
    """Label-smoothed CE with per-polymer smoothing mass (w/21 protein, w/5
    DNA, w/5 RNA) and PPM soft-label substitution
    (reference na_model_utils.py:111-146).

    The loss is normalized by the fixed token budget (LOSS_TOKENS), not the
    mask sum — reference na_model_utils.py:145.
    """
    fdtype = log_probs.dtype
    S_onehot = jax.nn.one_hot(S, num_letters, dtype=fdtype)
    if ppm_mask is not None and aligned_ppm is not None:
        pm = ppm_mask.astype(fdtype)[..., None]
        S_onehot = (1.0 - pm) * S_onehot + pm * aligned_ppm.astype(fdtype)

    protein_mask = polymer_masks["protein"].astype(fdtype)
    dna_mask = polymer_masks["dna"].astype(fdtype)
    rna_mask = polymer_masks["rna"].astype(fdtype)
    prm = jnp.asarray(restype_masks["protein"], fdtype)
    drm = jnp.asarray(restype_masks["dna"], fdtype)
    rrm = jnp.asarray(restype_masks["rna"], fdtype)
    nums = restype_masks["nums"]

    eps = (protein_mask[..., None] * prm[None, None, :] * (weight / nums["protein"])
           + dna_mask[..., None] * drm[None, None, :] * (weight / nums["dna"])
           + rna_mask[..., None] * rrm[None, None, :] * (weight / nums["rna"]))

    # Scale every polymer-restype column by (1-weight); MAS/PAD columns are
    # untouched. Boolean union matters: with shared NA tokens the DNA columns
    # appear in both the dna and rna restype masks
    # (reference na_model_utils.py:130,141).
    all_restype_mask = ((prm + drm + rrm) > 0).astype(fdtype)
    S_onehot = S_onehot * (1.0 - weight * all_restype_mask)
    S_onehot = S_onehot + eps

    loss = -jnp.sum(S_onehot * log_probs, axis=-1)
    loss_av = jnp.sum(loss * mask) / tokens
    return loss, loss_av


def compute_canonical_base_pair_accuracy(log_probs, canonical_base_pair_mask,
                                         canonical_base_pair_index,
                                         na_shared_tokens: bool = True):
    """1 where the argmax predictions at (i, partner(i)) form one of the 16
    canonical WC pairs (reference na_model_utils.py:148-165)."""
    S_pred = jnp.argmax(log_probs, axis=-1)
    partner_pred = jnp.take_along_axis(S_pred, canonical_base_pair_index, axis=1)
    acc = jnp.zeros_like(S_pred, dtype=bool)
    for res_i, res_j in constants.canonical_base_pair_ints(na_shared_tokens):
        acc = acc | ((S_pred == res_i) & (partner_pred == res_j))
    return acc.astype(jnp.int32) * canonical_base_pair_mask


def mask_for_loss(S, mask, na_shared_tokens: bool = True):
    """Exclude UNK/DX/RX/MAS/PAD tokens from loss (reference na_run.py:131-136,
    205-207)."""
    no_loss = jnp.asarray(constants.tokens_with_no_loss(na_shared_tokens))
    S_mask = 1 - jnp.any(S[..., None] == no_loss[None, None, :], axis=-1).astype(mask.dtype)
    return mask * S_mask
