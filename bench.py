"""Benchmark: NA-MPNN throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric: jitted TRAINING step (forward + backward + Noam-Adam update,
dropout + coordinate noise on — the workload the reference budgets 2 A100-days
for, launch_training.sh:2-6) in edges/s/chip at the reference training regime:
a 6000-token dense batch (BATCH_TOKENS, reference design_model.json:21),
K=32 neighbors, H=128, 3 enc + 3 dec layers, bf16 trunk + Pallas kernels.
edges/s counts (B*L*K) graph edges fully processed per step.

"extra" carries secondary metrics: deterministic forward edges/s, a
per-stage forward breakdown (kNN / RBF-featurizer / encoder / decoder ms),
and autoregressive sampling ms/residue at the 1am9-like shape (L=389,
reference README.md:71 runs both examples in <1 min on CPU).

vs_baseline compares the training step against the reference's implied A100
training throughput; the repo publishes no numbers (BASELINE.md), so the
baseline constant is derived from the published training allocation
(100k steps of <=6000-token batches budgeted for 2 days of A100;
launch_training.sh:2-6 + design_model.json:19,21):
100000 steps * 6000 tokens * 32 edges / 172800 s ~= 1.11e5 edges/s.
This is the throughput the reference NEEDS to finish its configured run
inside its Slurm allocation — a lower bound on its actual speed (the job
may finish early), so treat vs_baseline as an upper bound on the speedup.
For a hardware-honest comparison, extra carries the measured achievable
bf16 peak of this relay chip and the train-step throughput scaled to
full v5e spec (197 TFLOP/s).

Timing notes: every measurement chains n iterations through a data
dependency and ends with one host readback — on the axon relay,
block_until_ready does not force remote execution but a readback does.
"""
import json
import os
import time

import numpy as np

# Allocation-implied reference A100 training throughput (see module
# docstring; a lower bound on the reference's actual speed).
BASELINE_EDGES_PER_S = 1.11e5

B, L, K = 8, 768, 32  # ~6000-token training batch


def _chain_timer(fn, args, n_iter, carry0=0.0):
    """Time fn(carry, *args) chained n_iter times + one readback; returns
    best-of-two windows in seconds/iter (the relay occasionally serves
    degraded windows under host contention). fn must fold `carry` into its
    computation and return a scalar."""
    import jax
    import jax.numpy as jnp

    jit_fn = jax.jit(fn)
    carry = jnp.float32(carry0)
    carry = jit_fn(carry, *args)
    assert np.isfinite(float(carry))  # compile + force
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            carry = jit_fn(carry, *args)
        assert np.isfinite(float(carry))
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def bench_train_step(cfg, batch):
    """Full training step: value_and_grad + optimizer update, chained through
    the donated params (each step consumes the previous step's params)."""
    import jax
    from na_mpnn_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, seed=0)
    key = jax.random.PRNGKey(0)
    trainer.train_step(batch, key)  # compile
    # Two timed windows, best-of: the relay occasionally serves a degraded
    # first window after compilation storms (observed 600x outliers).
    best = float("inf")
    for w in range(2):
        n_iter = 8
        for i in range(2):  # warmup
            trainer.train_step(batch, jax.random.fold_in(key, 100 * w + i))
        t0 = time.perf_counter()
        for i in range(n_iter):
            m = trainer.train_step(batch, jax.random.fold_in(key, 100 * w + 10 + i))
        assert np.isfinite(float(m["loss_av"]))  # readback forces the chain
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def bench_forward(cfg, params, batch):
    import jax.numpy as jnp
    from na_mpnn_tpu.models import forward

    def fn(carry, params, batch):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        log_probs, _ = forward(params, cfg, b)
        return jnp.sum(log_probs)

    return _chain_timer(fn, (params, batch), 20)


def bench_stages(cfg, params, batch):
    """Per-stage forward breakdown (ms): kNN, fused RBF featurizer, encoder
    stack, decoder stack (SURVEY §5 tracing row)."""
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import mpnn
    from na_mpnn_tpu.models.features import (build_augmented_atoms,
                                             features_apply)
    from na_mpnn_tpu.ops.knn import knn_graph_pallas

    stages = {}
    X_aug, X_m_aug, X_ref = build_augmented_atoms(
        jnp.asarray(batch["X"]), jnp.asarray(batch["X_m"]), batch, cfg)
    mask = jnp.asarray(batch["mask"])

    def knn_fn(carry, X_ref):
        _, E_idx = knn_graph_pallas(X_ref + carry * 0.0, mask, cfg.k_neighbors)
        return jnp.sum(E_idx).astype(jnp.float32)

    stages["knn_ms"] = _chain_timer(knn_fn, (X_ref,), 20) * 1e3

    _, E_idx = knn_graph_pallas(X_ref, mask, cfg.k_neighbors)
    W = params["features"]["edge_embedding"]["w"]
    n_pos = cfg.num_positional_embeddings
    from na_mpnn_tpu.ops.rbf_classed import rbf_edge_features_classed

    def rbf_fn(carry, X_aug):
        out = rbf_edge_features_classed(
            X_aug + carry * 0.0, X_m_aug, E_idx, W[n_pos:],
            compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
            else jnp.float32)
        return jnp.sum(out)

    stages["rbf_featurizer_ms"] = _chain_timer(rbf_fn, (X_aug,), 20) * 1e3

    def feat_fn(carry, batch):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        V, E, E_idx = features_apply(params["features"], cfg, b)
        return jnp.sum(E) + jnp.sum(V)

    stages["featurizer_total_ms"] = _chain_timer(feat_fn, (batch,), 20) * 1e3

    def encode_fn(carry, batch):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        h_V, h_E, _ = mpnn.encode(params, cfg, b)
        return jnp.sum(h_V.astype(jnp.float32))

    encode_s = _chain_timer(encode_fn, (batch,), 20)
    stages["encoder_stack_ms"] = encode_s * 1e3 - stages["featurizer_total_ms"]

    def full_fn(carry, batch):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        lp, _ = mpnn.forward(params, cfg, b)
        return jnp.sum(lp)

    full_s = _chain_timer(full_fn, (batch,), 20)
    stages["decoder_stack_ms"] = (full_s - encode_s) * 1e3
    stages["forward_total_ms"] = full_s * 1e3
    return {k: float(f"{v:.4g}") for k, v in stages.items()}


def bench_sampler(cfg, params):
    """Autoregressive sample() at the 1am9-like shape (L=389, one structure,
    decode batch 1) — reference CPU does this in <1 min (README.md:71)."""
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import sample
    from __graft_entry__ import _synthetic_batch

    Ls = 389
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=1, L=Ls).items()}
    batch["chain_mask"] = batch["mask"]
    key = jax.random.PRNGKey(0)

    jit_sample = jax.jit(lambda p, b, k: sample(p, cfg, b, k, num_samples=1,
                                                temperature=0.1))
    out = jit_sample(params, batch, key)
    assert np.isfinite(float(jnp.sum(out["log_probs"])))  # compile + force
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        out = jit_sample(params, batch, jax.random.fold_in(key, i))
        assert int(jnp.sum(out["S"])) >= 0  # readback each (no data chain)
    dt = (time.perf_counter() - t0) / n
    return {"sample_total_s": float(f"{dt:.4g}"),
            "sample_ms_per_residue": float(f"{dt / Ls * 1e3:.4g}")}


def bench_batch_design(cfg, params):
    """Packed multi-structure design throughput: 8 structures x 10 samples
    decode in one lax.scan at the design protocol (T=0.1, L=128 bucket) —
    the workload the reference sizes as a 200-task Slurm array x 20 min CPU
    for 1373 structures (evaluation_cmds.txt:104-108 ~ 0.006 structures/s
    per CPU task)."""
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models.mpnn import sample_multi
    from __graft_entry__ import _synthetic_batch

    N, S_rep, Ls = 8, 10, 128
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=N, L=Ls).items()}
    batch["chain_mask"] = batch["mask"]
    key = jax.random.PRNGKey(0)
    jit_sample = jax.jit(lambda p, b, k: sample_multi(
        p, cfg, b, k, samples_per_structure=S_rep, temperature=0.1))
    out = jit_sample(params, batch, key)
    assert np.isfinite(float(jnp.sum(out["log_probs"])))  # compile + force
    n = 3
    best = float("inf")
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(n):
            out = jit_sample(params, batch, jax.random.fold_in(key, w * 10 + i))
            assert int(jnp.sum(out["S"])) >= 0  # readback
        best = min(best, (time.perf_counter() - t0) / n)
    return {"batch_design_structures_per_s": float(f"{N / best:.4g}"),
            "batch_design_samples_per_s": float(f"{N * S_rep / best:.4g}")}


def bench_long_forward(cfg, params):
    """Deterministic forward on one 6144-residue graph — the scale at which
    the reference excludes or spatially crops structures
    (na_data_utils.py:1037-1071,1414-1416); here it runs whole on one chip."""
    import jax.numpy as jnp
    from na_mpnn_tpu.models import forward
    from __graft_entry__ import _synthetic_batch

    Ls = 6144
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=1, L=Ls).items()}

    def fn(carry, batch):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        log_probs, _ = forward(params, cfg, b)
        return jnp.sum(log_probs)

    dt = _chain_timer(fn, (batch,), 10)
    return {"long_graph_L6144_forward_ms": float(f"{dt * 1e3:.4g}"),
            "long_graph_L6144_edges_per_s": float(f"{Ls * K / dt:.6g}")}


def bench_peak_tflops():
    """Achievable bf16 matmul peak on this chip (chained 4096^2 matmuls +
    one readback). Context for the absolute numbers: the relay hardware
    delivers a fraction of real-v5e spec (197 bf16 TFLOP/s), and this
    measurement quantifies that fraction in the same process as the model
    benchmarks."""
    import jax
    import jax.numpy as jnp

    n, d = 24, 4096
    a = jnp.ones((d, d), jnp.bfloat16)

    @jax.jit
    def chain(x):
        for _ in range(n):
            x = jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
            x = x * (1.0 / d)
        return jnp.float32(x[0, 0])

    assert np.isfinite(float(chain(a)))  # compile + force
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        v = chain(a)
        assert np.isfinite(float(v))
        best = min(best, time.perf_counter() - t0)
    return 2 * d ** 3 * n / best / 1e12


def _await_backend(timeout_s: float) -> None:
    """Fail fast (instead of hanging forever) when the relay tile is wedged:
    a killed-mid-init client has been observed to leave the remote session
    held for 1h+, making every later backend init block inside
    make_c_api_client. Probe device init on a daemon thread and abort with
    a diagnostic if it does not come up in time."""
    import threading

    done = threading.Event()
    err = []

    def probe():
        try:
            import jax
            jax.devices()
        except BaseException as e:  # noqa: BLE001 — reported, not swallowed
            err.append(e)
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "error": f"backend init did not complete in {timeout_s:.0f}s "
                     "(relay tile wedged?); no measurement taken",
        }))
        raise SystemExit(1)
    if err:
        print(json.dumps({
            "error": f"backend init failed: {type(err[0]).__name__}: "
                     f"{err[0]}",
        }))
        raise SystemExit(1)


def main():
    _await_backend(float(os.environ.get("BENCH_INIT_TIMEOUT_S", "900")))
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import ModelConfig, init_params
    from __graft_entry__ import _synthetic_batch

    train_cfg = ModelConfig(dropout=0.1, protein_augment_eps=0.1,
                            dna_augment_eps=0.1, rna_augment_eps=0.1,
                            compute_dtype="bfloat16")
    fwd_cfg = ModelConfig(dropout=0.0, compute_dtype="bfloat16")
    np_batch = _synthetic_batch(B=B, L=L)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    params = init_params(jax.random.PRNGKey(0), fwd_cfg)

    edges = B * L * K
    train_s = bench_train_step(train_cfg, np_batch)
    train_edges_per_s = edges / train_s

    extra = {"train_step_ms": float(f"{train_s * 1e3:.4g}")}
    fwd_s = bench_forward(fwd_cfg, params, batch)
    extra["forward_edges_per_s"] = float(f"{edges / fwd_s:.6g}")
    extra.update(bench_stages(fwd_cfg, params, batch))
    extra.update(bench_sampler(fwd_cfg, params))
    extra.update(bench_batch_design(fwd_cfg, params))
    extra.update(bench_long_forward(fwd_cfg, params))
    # Hardware context: this chip's achievable bf16 peak vs the 197 TFLOP/s
    # v5e spec. The scaled estimate is what the same train step implies on a
    # full-spec chip (the model is compute-bound here: 4x batch -> 4.1x time).
    peak = bench_peak_tflops()
    extra["relay_peak_bf16_tflops"] = float(f"{peak:.4g}")
    extra["v5e_spec_scaled_train_edges_per_s_estimate"] = float(
        f"{train_edges_per_s * 197.0 / max(peak, 1e-9):.4g}")

    print(json.dumps({
        "metric": "mpnn_train_step_edges_per_s",
        "value": float(f"{train_edges_per_s:.6g}"),
        "unit": "edges/s/chip",
        "vs_baseline": float(f"{train_edges_per_s / BASELINE_EDGES_PER_S:.4g}"),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
