"""Benchmark: MPNN encoder+decoder forward throughput in edges/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the reference training regime: a 6000-token dense batch
(BATCH_TOKENS, reference design_model.json:21), K=32 neighbors, H=128,
3 enc + 3 dec layers. edges/s counts (B*L*K) graph edges fully processed per
forward pass. vs_baseline compares against the reference's implied A100
training throughput; the repo publishes no numbers (BASELINE.md), so the
baseline constant below is an estimated reference edges/s derived from the
published training allocation (100k steps of <=6000-token batches budgeted
for 2 days of A100; launch_training.sh:2-6 + design_model.json:19,21):
100000 steps * 6000 tokens * 32 edges / 172800 s ~= 1.11e8 edges/s.
"""
import json
import time

import numpy as np

# Estimated reference throughput (see module docstring).
BASELINE_EDGES_PER_S = 1.11e8


def main():
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import ModelConfig, forward, init_params
    from __graft_entry__ import _synthetic_batch

    # Training-shaped batch: 8 structures x 768 residues ~= 6000 tokens.
    B, L = 8, 768
    # Production config: bf16 trunk (the TPU analog of the reference's AMP
    # training, na_run.py:21,216-237) + Pallas kernels.
    cfg = ModelConfig(dropout=0.0, compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=B, L=L).items()}

    # Chain iterations through a data dependency (the carry perturbs X by
    # exactly 0.0 but forces sequential execution) so a caching/pipelining
    # runtime cannot overlap or deduplicate identical dispatches.
    @jax.jit
    def fwd_chained(params, batch, carry):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        log_probs, _ = forward(params, cfg, b)
        return jnp.sum(log_probs)

    carry = jnp.float32(0.0)
    carry = fwd_chained(params, batch, carry)
    float(carry)  # compile + force execution (block_until_ready is not
    # sufficient through remote-relay backends; a host readback is)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        carry = fwd_chained(params, batch, carry)
    assert np.isfinite(float(carry))  # host readback forces real execution
    dt = time.perf_counter() - t0

    edges = B * L * cfg.k_neighbors
    edges_per_s = edges * n_iter / dt
    print(json.dumps({
        "metric": "mpnn_forward_edges_per_s",
        "value": float(f"{edges_per_s:.6g}"),
        "unit": "edges/s/chip",
        "vs_baseline": float(f"{edges_per_s / BASELINE_EDGES_PER_S:.4g}"),
    }))


if __name__ == "__main__":
    main()
