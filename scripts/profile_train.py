"""Decompose the training step cost in ONE process (interleaved reps):
  - full train step (fwd+bwd+Adam)        [baseline]
  - value_and_grad only (no optimizer)
  - grad with dropout rate 0 (training path, no masks)
  - grad with threefry vs rbg RNG for the step keys
  - training-mode forward only (dropout on, no grad)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from na_mpnn_tpu.models import ModelConfig, init_params, forward
from na_mpnn_tpu.train.losses import (loss_smoothed, make_polymer_restype_masks,
                                      mask_for_loss)
from __graft_entry__ import _synthetic_batch

B, L, K = 8, 768, 32


def timer(fn, *args, n_iter=8):
    out = fn(*args)
    jax.tree.map(lambda x: None, out)
    assert np.isfinite(float(jax.tree.leaves(out)[0].reshape(-1)[0]))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    assert np.isfinite(float(jax.tree.leaves(out)[0].reshape(-1)[0]))
    return (time.perf_counter() - t0) / n_iter


def main():
    cfg = ModelConfig(dropout=0.1, protein_augment_eps=0.1,
                      dna_augment_eps=0.1, rna_augment_eps=0.1,
                      compute_dtype="bfloat16")
    cfg0 = ModelConfig(dropout=0.0, protein_augment_eps=0.0,
                       dna_augment_eps=0.0, rna_augment_eps=0.0,
                       compute_dtype="bfloat16")
    np_batch = _synthetic_batch(B=B, L=L)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)

    restype_masks = make_polymer_restype_masks(True)

    def mkloss(c):
        def loss_fn(p, k):
            log_probs, _ = forward(p, c, batch, key=k, deterministic=False)
            mfl = mask_for_loss(batch["S"], batch["mask"], True)
            mfl = mfl.astype(jnp.float32)
            polymer_masks = {"protein": batch["protein_mask"],
                             "dna": batch["dna_mask"],
                             "rna": batch["rna_mask"]}
            _, loss_av = loss_smoothed(
                batch["S"], log_probs, mfl, polymer_masks, restype_masks,
                ppm_mask=batch["ppm_mask"], aligned_ppm=batch["aligned_ppm"])
            return loss_av
        return loss_fn

    grad_full = jax.jit(jax.value_and_grad(mkloss(cfg)))
    grad_nodrop = jax.jit(jax.value_and_grad(mkloss(cfg0)))
    fwd_train = jax.jit(lambda p, k: mkloss(cfg)(p, k))

    from na_mpnn_tpu.train.trainer import Trainer
    trainer = Trainer(cfg, seed=0)
    trainer.train_step(batch, key)  # compile

    results = {}
    for rep in range(3):
        k = jax.random.fold_in(key, rep)
        t = timer(lambda: trainer.train_step(batch, k))
        results["train_step"] = min(results.get("train_step", 9e9), t)
        t = timer(lambda: grad_full(params, k))
        results["value_and_grad"] = min(results.get("value_and_grad", 9e9), t)
        t = timer(lambda: grad_nodrop(params, k))
        results["grad_nodrop_noaug"] = min(
            results.get("grad_nodrop_noaug", 9e9), t)
        t = timer(lambda: fwd_train(params, k))
        results["fwd_train_mode"] = min(results.get("fwd_train_mode", 9e9), t)
    for name, t in results.items():
        print(f"{name:22s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
