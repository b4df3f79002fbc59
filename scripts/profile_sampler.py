"""Sampler latency profile on the real chip: single-structure design decode
(L=389, 1am9-like) and the specificity workload shape (B=30 samples, L=256
bucket), plus the batched multi-structure design decode."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import ModelConfig, init_params, sample
    from na_mpnn_tpu.models.mpnn import sample_multi
    from __graft_entry__ import _synthetic_batch

    cfg = ModelConfig(dropout=0.0, compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(0)

    def timeit(fn, n=3, reps=2):
        out = fn(0)
        assert np.isfinite(float(jnp.sum(out["log_probs"])))
        best = float("inf")
        for w in range(reps):
            t0 = time.perf_counter()
            for i in range(n):
                out = fn(w * 10 + i)
                assert int(jnp.sum(out["S"])) >= 0
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    # Design: 1 structure, 1 sample, L=389
    Ls = 389
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=1, L=Ls).items()}
    batch["chain_mask"] = batch["mask"]
    f = jax.jit(lambda p, b, k: sample(p, cfg, b, k, num_samples=1,
                                       temperature=0.1))
    dt = timeit(lambda i: f(params, batch, jax.random.fold_in(key, i)))
    print(f"design L=389 B=1: {dt*1e3:.1f} ms total, "
          f"{dt/Ls*1e3:.3f} ms/residue", flush=True)

    # Specificity: 1 structure, 30 samples, L=256
    Ls = 256
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=1, L=Ls).items()}
    batch["chain_mask"] = batch["mask"]
    f = jax.jit(lambda p, b, k: sample(p, cfg, b, k, num_samples=30,
                                       temperature=0.6))
    dt = timeit(lambda i: f(params, batch, jax.random.fold_in(key, i)))
    print(f"specificity L=256 B=30: {dt*1e3:.1f} ms/structure "
          f"-> {1.0/dt:.1f} structures(x30 samples)/s", flush=True)

    # Batched design: 8 structures x 10 samples, L=128
    N, S_rep, Ls = 8, 10, 128
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=N, L=Ls).items()}
    batch["chain_mask"] = batch["mask"]
    f = jax.jit(lambda p, b, k: sample_multi(p, cfg, b, k,
                                             samples_per_structure=S_rep,
                                             temperature=0.1))
    dt = timeit(lambda i: f(params, batch, jax.random.fold_in(key, i)))
    print(f"batch design 8x10 L=128: {dt*1e3:.1f} ms "
          f"-> {N/dt:.1f} structures/s, {N*S_rep/dt:.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
