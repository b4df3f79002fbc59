"""Probe the host->device feed path: where do the ~12 ms/step of
with-feed overhead go, and can H2D overlap device compute on the relay?

Stages measured:
  pack      — host-side _pack_np_batch memcpy
  asarray   — jnp.asarray(packed) until the python call returns
  asarray_b — jnp.asarray(packed) + block_until_ready
  step_loop — full train_step(np_batch) loop (the bench headline)
  dev_loop  — device-resident step loop (the bench device row)
  overlap   — long compute chain with a device_put issued mid-chain vs
              without: if total time is unchanged, H2D overlaps compute.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, L, K = 8, 768, 32


def main():
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import ModelConfig
    from na_mpnn_tpu.train.trainer import Trainer
    from __graft_entry__ import _synthetic_batch

    cfg = ModelConfig(dropout=0.1, protein_augment_eps=0.1,
                      dna_augment_eps=0.1, rna_augment_eps=0.1,
                      compute_dtype="bfloat16")
    np_batch = _synthetic_batch(B=B, L=L)
    trainer = Trainer(cfg, seed=0)
    key = jax.random.PRNGKey(0)
    out = {}

    arrays = {k: np_batch[k] for k in np_batch}
    packed, layout = trainer._pack_np_batch(
        {k: np_batch[k] for k in np_batch})
    out["packed_bytes"] = int(packed.size)

    t0 = time.perf_counter()
    for _ in range(20):
        packed, layout = trainer._pack_np_batch(
            {k: np_batch[k] for k in np_batch})
    out["pack_ms"] = (time.perf_counter() - t0) / 20 * 1e3

    d = jnp.asarray(packed); d.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        d = jnp.asarray(packed)
    out["asarray_ms"] = (time.perf_counter() - t0) / 20 * 1e3
    t0 = time.perf_counter()
    for _ in range(20):
        d = jnp.asarray(packed); d.block_until_ready()
    out["asarray_block_ms"] = (time.perf_counter() - t0) / 20 * 1e3

    # Full with-feed loop (compile first).
    trainer.train_step(np_batch, key)
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(8):
            m = trainer.train_step(np_batch, jax.random.fold_in(key, i))
        assert np.isfinite(float(m["loss_av"]))
        out["step_loop_ms"] = min(out.get("step_loop_ms", 1e9),
                                  (time.perf_counter() - t0) / 8 * 1e3)

    # Device-resident loop.
    dbatch = trainer._device_batch(np_batch)
    p = jax.tree.map(jnp.copy, trainer.params)
    o = jax.tree.map(jnp.copy, trainer.opt_state)
    p, o, m = trainer._train_step(p, o, dbatch, key)
    assert np.isfinite(float(m["loss_av"]))
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(8):
            p, o, m = trainer._train_step(p, o, dbatch,
                                          jax.random.fold_in(key, i))
        assert np.isfinite(float(m["loss_av"]))
        out["dev_loop_ms"] = min(out.get("dev_loop_ms", 1e9),
                                 (time.perf_counter() - t0) / 8 * 1e3)

    # Packed loop but with the SAME device packed buffer every step (no H2D):
    # isolates the unpack+step dispatch from the transfer.
    fn = trainer._packed_step_fn(layout)
    dpacked = jnp.asarray(packed)
    p = jax.tree.map(jnp.copy, trainer.params)
    o = jax.tree.map(jnp.copy, trainer.opt_state)
    p, o, m = fn(p, o, dpacked, key)
    assert np.isfinite(float(m["loss_av"]))
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(8):
            p, o, m = fn(p, o, dpacked, jax.random.fold_in(key, i))
        assert np.isfinite(float(m["loss_av"]))
        out["packed_nofeed_loop_ms"] = min(
            out.get("packed_nofeed_loop_ms", 1e9),
            (time.perf_counter() - t0) / 8 * 1e3)

    # Overlap test: a ~80 ms compute chain; issue a 3MB device_put midway.
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(i, x):
            return jnp.dot(x, a, preferred_element_type=jnp.bfloat16) * (1.0 / 4096)
        return jax.lax.fori_loop(0, 96, body, x)

    r = chain(a); np.asarray(r[0, :1])
    big = np.ones(3 << 20, np.uint8)
    t0 = time.perf_counter()
    for _ in range(5):
        r = chain(r)
        np.asarray(r[0, :1])
    out["chain_ms"] = (time.perf_counter() - t0) / 5 * 1e3
    t0 = time.perf_counter()
    for _ in range(5):
        r = chain(r)
        h = jnp.asarray(big)        # issued while chain is in flight
        np.asarray(r[0, :1])
        h.block_until_ready()
    out["chain_plus_put_ms"] = (time.perf_counter() - t0) / 5 * 1e3

    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
