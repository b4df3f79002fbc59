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
For a hardware-honest comparison, extra carries the chip's measured
amortized bf16 peak and HBM bandwidth, the achievable ceiling of the
model's own H=128 matmul shape, and a per-stage roofline table (XLA cost
analysis flops/bytes, achieved TFLOP/s + GB/s, % of the roofline bound).

Timing notes: every measurement chains n iterations through a data
dependency and ends with one host readback — on the axon relay,
block_until_ready does not force remote execution but a readback does.
The relay adds a ~27 ms fixed dispatch/readback latency per call chain;
peak measurements run long fori_loop chains to amortize it, and every
metric reports best-of-N windows with min/median/spread (BENCH_WINDOWS,
default 5) so round-over-round comparisons know their noise floor.
"""
import json
import os
import time

import numpy as np

# Allocation-implied reference A100 training throughput (see module
# docstring; a lower bound on the reference's actual speed).
BASELINE_EDGES_PER_S = 1.11e5

B, L, K = 8, 768, 32  # ~6000-token training batch


N_WINDOWS = int(os.environ.get("BENCH_WINDOWS", "5"))


def _window_stats(times):
    """min/median/spread over per-iteration window times. spread =
    (max-min)/median — the relay's window-to-window variability, reported
    so round-over-round comparisons know their noise floor."""
    times = sorted(times)
    med = times[len(times) // 2] if len(times) % 2 else \
        0.5 * (times[len(times) // 2 - 1] + times[len(times) // 2])
    return {"min": times[0], "median": med,
            "spread": (times[-1] - times[0]) / med if med > 0 else 0.0}


def _chain_timer(fn, args, n_iter, carry0=0.0, n_windows=None):
    """Time fn(carry, *args) chained n_iter times + one readback per window;
    returns {min, median, spread} seconds/iter over n_windows windows (the
    relay occasionally serves degraded windows under host contention). fn
    must fold `carry` into its computation and return a scalar."""
    import jax
    import jax.numpy as jnp

    jit_fn = jax.jit(fn)
    carry = jnp.float32(carry0)
    carry = jit_fn(carry, *args)
    assert np.isfinite(float(carry))  # compile + force
    times = []
    for _ in range(n_windows or N_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            carry = jit_fn(carry, *args)
        assert np.isfinite(float(carry))
        times.append((time.perf_counter() - t0) / n_iter)
    return _window_stats(times)


def _cost_analysis(jit_fn, *args):
    """XLA-reported (flops, bytes accessed) for a jitted callable, or
    (None, None) when the backend does not expose cost analysis."""
    try:
        c = jit_fn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def _roofline_row(name, seconds, flops, bytes_, peak_tflops, peak_gbs):
    """Per-stage roofline entry: achieved TFLOP/s + GB/s, the roofline-bound
    time max(flops/peak_flops, bytes/peak_bw), and %-of-roofline =
    bound_time/measured_time."""
    row = {"ms": float(f"{seconds * 1e3:.4g}")}
    if flops is not None:
        row["gflop"] = float(f"{flops / 1e9:.4g}")
        row["gb"] = float(f"{bytes_ / 1e9:.4g}")
        row["tflops"] = float(f"{flops / seconds / 1e12:.4g}")
        row["gbs"] = float(f"{bytes_ / seconds / 1e9:.4g}")
        bound_s = max(flops / (peak_tflops * 1e12), bytes_ / (peak_gbs * 1e9))
        row["bound_ms"] = float(f"{bound_s * 1e3:.4g}")
        row["pct_roofline"] = float(f"{100.0 * bound_s / seconds:.4g}")
    return row


def bench_train_step(cfg, batch):
    """Full training step: value_and_grad + optimizer update, chained through
    the donated params (each step consumes the previous step's params).
    Returns ({min, median, spread} seconds/step, (flops, bytes))."""
    import jax
    from na_mpnn_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, seed=0)
    key = jax.random.PRNGKey(0)
    trainer.train_step(batch, key)  # compile
    cost = trainer.step_cost_analysis(batch, key)
    times = []
    n_iter = 8
    for w in range(N_WINDOWS):
        for i in range(2):  # warmup after possible relay hiccups
            trainer.train_step(batch, jax.random.fold_in(key, 100 * w + i))
        t0 = time.perf_counter()
        for i in range(n_iter):
            m = trainer.train_step(batch, jax.random.fold_in(key, 100 * w + 10 + i))
        assert np.isfinite(float(m["loss_av"]))  # readback forces the chain
        times.append((time.perf_counter() - t0) / n_iter)
    return _window_stats(times), cost


def bench_step_decomposition(cfg, np_batch, peak_tflops, peak_gbs):
    """Whole-train-step decomposition, ONE process, interleaved round-robin
    windows (VERDICT r3 item 2): train-mode forward (noise + dropout),
    value_and_grad, optimizer update, metrics, the fused device-resident
    step, and the headline step with its per-step host feed. Returns
    roofline rows for each plus a DERIVED backward row (valgrad − forward,
    in both time and cost), so the rows cover the entire step and their
    provenance is a single process and measurement window."""
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.train.losses import mask_for_loss
    from na_mpnn_tpu.train.trainer import BATCH_KEYS, Trainer

    trainer = Trainer(cfg, seed=0)
    key = jax.random.PRNGKey(7)
    dbatch = trainer._device_batch(np_batch)
    params, opt_state = trainer.params, trainer.opt_state

    def fwd_fn(carry, params, batch):
        k2 = jax.random.fold_in(key, (carry * 0).astype(jnp.int32))
        loss, _ = trainer._loss_fn(params, batch, k2)
        return jnp.sum(loss)

    def vg_fn(carry, params, batch):
        k2 = jax.random.fold_in(key, (carry * 0).astype(jnp.int32))
        (loss, _), grads = jax.value_and_grad(
            trainer._loss_fn, has_aux=True)(params, batch, k2)
        extra = sum(jnp.sum(g) * 0.0 for g in jax.tree.leaves(grads))
        return jnp.sum(loss) + extra

    grads_const = jax.tree.map(jnp.ones_like, params)

    def opt_fn(carry, grads, opt_state, params):
        # Matches the trainer's fused path: ravel the grad tree, run the
        # whole optax chain on one flat vector, unravel the updates.
        from jax.flatten_util import ravel_pytree
        g = jax.tree.map(lambda x: x + carry * 0.0, grads)
        flat_g, _ = ravel_pytree(g)
        updates_flat, _ = trainer.optimizer.update(flat_g, opt_state)
        updates = trainer._unravel_params(updates_flat)
        return sum(jnp.sum(u) * 0.0 for u in jax.tree.leaves(updates)) + carry * 0.0

    lp0 = jnp.zeros(np_batch["S"].shape + (cfg.num_letters,), jnp.float32)
    mfl = mask_for_loss(dbatch["S"], dbatch["mask"], True).astype(jnp.float32)

    def met_fn(carry, lp, batch):
        m = trainer._metrics_from_logprobs(batch, lp + carry * 0.0, mfl)
        return jnp.sum(m["loss_per_token"]) + jnp.sum(m["accuracy"]) * 0.0

    stages = {
        "train_forward": (fwd_fn, (params, dbatch), 10),
        "train_valgrad": (vg_fn, (params, dbatch), 8),
        "optimizer": (opt_fn, (grads_const, opt_state, params), 20),
        "metrics": (met_fn, (lp0, dbatch), 20),
    }
    jitted, carries, times = {}, {}, {k: [] for k in stages}
    times["device_step"] = []
    for name, (fn, args, _n) in stages.items():
        jitted[name] = jax.jit(fn)
        carries[name] = jitted[name](jnp.float32(0.0), *args)
        assert np.isfinite(float(carries[name]))
    # compile the fused device step on COPIES: _train_step donates its
    # params/opt_state buffers, and the other stages keep using the
    # originals.
    import jax.numpy as _jnp
    p = jax.tree.map(_jnp.copy, params)
    o = jax.tree.map(_jnp.copy, opt_state)
    p, o, m = trainer._train_step(p, o, dbatch, key)
    assert np.isfinite(float(m["loss_av"]))

    for w in range(N_WINDOWS):
        for name, (fn, args, n_iter) in stages.items():
            c = carries[name]
            t0 = time.perf_counter()
            for _ in range(n_iter):
                c = jitted[name](c, *args)
            assert np.isfinite(float(c))
            times[name].append((time.perf_counter() - t0) / n_iter)
            carries[name] = c
        t0 = time.perf_counter()
        for i in range(10):
            p, o, m = trainer._train_step(p, o, dbatch,
                                          jax.random.fold_in(key, 97 * w + i))
        assert np.isfinite(float(m["loss_av"]))
        times["device_step"].append((time.perf_counter() - t0) / 10)

    secs = {k: _window_stats(v)["min"] for k, v in times.items()}
    costs = {
        "train_forward": _cost_analysis(jitted["train_forward"],
                                        jnp.float32(0.0), params, dbatch),
        "train_valgrad": _cost_analysis(jitted["train_valgrad"],
                                        jnp.float32(0.0), params, dbatch),
        "optimizer": _cost_analysis(jitted["optimizer"], jnp.float32(0.0),
                                    grads_const, opt_state, params),
        "metrics": _cost_analysis(jitted["metrics"], jnp.float32(0.0), lp0,
                                  dbatch),
    }
    rows = {}
    for name, s in secs.items():
        flops, bytes_ = costs.get(name, (None, None))
        rows[name] = _roofline_row(name, s, flops, bytes_, peak_tflops,
                                   peak_gbs)
    # Derived backward = valgrad − forward (time and cost are both
    # differences of same-process, same-window measurements).
    bwd_s = max(secs["train_valgrad"] - secs["train_forward"], 1e-9)
    f_fw, b_fw = costs["train_forward"]
    f_vg, b_vg = costs["train_valgrad"]
    if f_fw is not None and f_vg is not None:
        rows["backward_derived"] = _roofline_row(
            "backward_derived", bwd_s, f_vg - f_fw, b_vg - b_fw,
            peak_tflops, peak_gbs)
    else:
        rows["backward_derived"] = {"ms": float(f"{bwd_s * 1e3:.4g}")}
    rows["device_step"] = {"ms": float(f"{secs['device_step'] * 1e3:.4g}")}
    # Coverage: valgrad + optimizer + metrics vs the fused device step.
    covered = secs["train_valgrad"] + secs["optimizer"] + secs["metrics"]
    rows["coverage"] = {
        "sum_ms": float(f"{covered * 1e3:.4g}"),
        "device_step_ms": float(f"{secs['device_step'] * 1e3:.4g}"),
        "pct_of_device_step": float(
            f"{100.0 * covered / secs['device_step']:.4g}"),
    }
    return rows


def bench_forward(cfg, params, batch):
    import jax.numpy as jnp
    from na_mpnn_tpu.models import forward

    def fn(carry, params, batch):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        log_probs, _ = forward(params, cfg, b)
        return jnp.sum(log_probs)

    return _chain_timer(fn, (params, batch), 20)["min"]


def bench_stages(cfg, params, batch, peak_tflops=None, peak_gbs=None):
    """Per-stage forward breakdown (ms) + per-stage roofline rows: kNN,
    fused RBF featurizer, featurizer remainder, encoder stack, decoder
    stack (SURVEY §5 tracing row; VERDICT r2 item 1)."""
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import mpnn
    from na_mpnn_tpu.models.features import (build_augmented_atoms,
                                             features_apply)
    from na_mpnn_tpu.ops.knn import knn_graph_pallas

    stages = {}
    roofline = {}
    X_aug, X_m_aug, X_ref = build_augmented_atoms(
        jnp.asarray(batch["X"]), jnp.asarray(batch["X_m"]), batch, cfg)
    mask = jnp.asarray(batch["mask"])

    def _stage(name, fn, args, n_iter=20):
        st = _chain_timer(fn, args, n_iter)
        stages[f"{name}_ms"] = st["min"] * 1e3
        if peak_tflops:
            import jax as _jax
            flops, bytes_ = _cost_analysis(
                _jax.jit(fn), jnp.float32(0.0), *args)
            roofline[name] = _roofline_row(name, st["min"], flops, bytes_,
                                           peak_tflops, peak_gbs)
        return st["min"]

    def knn_fn(carry, X_ref):
        _, E_idx = knn_graph_pallas(X_ref + carry * 0.0, mask, cfg.k_neighbors)
        return jnp.sum(E_idx).astype(jnp.float32)

    _stage("knn", knn_fn, (X_ref,))

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

    _stage("rbf_featurizer", rbf_fn, (X_aug,))

    def feat_fn(carry, batch):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        V, E, E_idx, _ = features_apply(params["features"], cfg, b)
        return jnp.sum(E) + jnp.sum(V)

    feat_s = _stage("featurizer_total", feat_fn, (batch,))
    stages["featurizer_rest_ms"] = (
        stages["featurizer_total_ms"] - stages["knn_ms"]
        - stages["rbf_featurizer_ms"])

    def encode_fn(carry, batch):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        h_V, h_E, _ = mpnn.encode(params, cfg, b)
        return jnp.sum(h_V.astype(jnp.float32))

    encode_s = _stage("encode", encode_fn, (batch,))
    stages["encoder_stack_ms"] = encode_s * 1e3 - stages["featurizer_total_ms"]

    def full_fn(carry, batch):
        b = dict(batch)
        b["X"] = batch["X"] + carry * 0.0
        lp, _ = mpnn.forward(params, cfg, b)
        return jnp.sum(lp)

    full_s = _stage("forward_total", full_fn, (batch,))
    stages["decoder_stack_ms"] = (full_s - encode_s) * 1e3
    out = {k: float(f"{v:.4g}") for k, v in stages.items()}
    if roofline:
        out["roofline"] = roofline
    return out


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
    times = []
    for w in range(N_WINDOWS):
        n = 3
        t0 = time.perf_counter()
        for i in range(n):
            out = jit_sample(params, batch, jax.random.fold_in(key, 10 * w + i))
            assert int(jnp.sum(out["S"])) >= 0  # readback each (no data chain)
        times.append((time.perf_counter() - t0) / n)
    dt = _window_stats(times)["min"]
    return {"sample_total_s": float(f"{dt:.4g}"),
            "sample_ms_per_residue": float(f"{dt / Ls * 1e3:.4g}")}


def bench_spec_sampler(cfg, params):
    """The specificity eval workload shape (reference evaluation_cmds.txt:
    29-63 drives 1592 structures x 30 samples): one structure, 30-sample
    decode batch at the L=256 bucket. Reports structures/s and
    predictions/s (a prediction = one 30-sample PPM)."""
    import jax
    import jax.numpy as jnp
    from na_mpnn_tpu.models import sample
    from __graft_entry__ import _synthetic_batch

    Ls = 256
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(B=1, L=Ls).items()}
    batch["chain_mask"] = batch["mask"]
    key = jax.random.PRNGKey(0)
    jit_sample = jax.jit(lambda p, b, k: sample(p, cfg, b, k, num_samples=30,
                                                temperature=0.6))
    out = jit_sample(params, batch, key)
    assert np.isfinite(float(jnp.sum(out["log_probs"])))
    times = []
    for w in range(N_WINDOWS):
        n = 3
        t0 = time.perf_counter()
        for i in range(n):
            out = jit_sample(params, batch, jax.random.fold_in(key, 10 * w + i))
            assert int(jnp.sum(out["S"])) >= 0
        times.append((time.perf_counter() - t0) / n)
    dt = _window_stats(times)["min"]
    return {"spec_ms_per_structure": float(f"{dt * 1e3:.4g}"),
            "spec_predictions_per_s": float(f"{1.0 / dt:.4g}")}


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

    dt = _chain_timer(fn, (batch,), 10)["min"]
    return {"long_graph_L6144_forward_ms": float(f"{dt * 1e3:.4g}"),
            "long_graph_L6144_edges_per_s": float(f"{Ls * K / dt:.6g}")}


def bench_peak_tflops():
    """Achievable bf16 matmul peak on this chip: a fori_loop chain of 384
    serially-dependent 4096^3 matmuls + one readback. The loop is long
    enough (~300 ms) to bury the relay's ~27 ms fixed dispatch/readback
    latency, which otherwise understates the peak ~2.5x (the r2 bench
    measured 72 TFLOP/s this way; amortized, the chip delivers ~170+)."""
    import jax
    import jax.numpy as jnp

    n, d = 384, 4096
    a = jnp.ones((d, d), jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(i, x):
            x = jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
            return x * (1.0 / d)
        return jnp.float32(jax.lax.fori_loop(0, n, body, x)[0, 0])

    assert np.isfinite(float(chain(a)))  # compile + force
    best = float("inf")
    for _ in range(max(2, N_WINDOWS - 2)):
        t0 = time.perf_counter()
        v = chain(a)
        assert np.isfinite(float(v))
        best = min(best, time.perf_counter() - t0)
    return 2 * d ** 3 * n / best / 1e12


def bench_peak_hbm_gbs():
    """Achievable HBM read bandwidth: fori_loop streaming 16 MB slabs of a
    768 MB operand (too big for VMEM residency, so every trip reads its
    slab from HBM; the [d,d] carry may stay resident and is not counted).
    Long enough to amortize the relay dispatch latency. The roofline's
    bandwidth ceiling — a conservative (read-only) lower bound."""
    import jax
    import jax.numpy as jnp

    m, d, n = 48, 2048, 6144
    A = jnp.ones((m, d, d), jnp.float32)
    x0 = jnp.zeros((d, d), jnp.float32)

    @jax.jit
    def chain(x):
        def body(i, x):
            slab = jax.lax.dynamic_index_in_dim(A, jax.lax.rem(i, m),
                                                keepdims=False)
            return x * 0.999 + slab
        return jnp.float32(jax.lax.fori_loop(0, n, body, x)[0, 0])

    assert np.isfinite(float(chain(x0)))
    best = float("inf")
    for _ in range(max(2, N_WINDOWS - 2)):
        t0 = time.perf_counter()
        v = chain(x0)
        assert np.isfinite(float(v))
        best = min(best, time.perf_counter() - t0)
    return 4 * d * d * n / best / 1e9


def bench_shape_ceiling_tflops():
    """Achievable bf16 throughput of the MODEL's own hot matmul shape
    ([B*L*K, H] @ [H, H] with H=128 — one MXU tile wide): the realistic
    per-stage ceiling. The 4096-square peak is unreachable for H=128
    contractions; stages should be judged against this number."""
    import jax
    import jax.numpy as jnp

    rows, h, n = 8 * 768 * 32, 128, 512
    w = jnp.ones((h, h), jnp.bfloat16)
    x0 = jnp.ones((rows, h), jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(i, x):
            x = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
            return x * (1.0 / h)
        return jnp.float32(jax.lax.fori_loop(0, n, body, x)[0, 0])

    assert np.isfinite(float(chain(x0)))
    best = float("inf")
    for _ in range(max(2, N_WINDOWS - 2)):
        t0 = time.perf_counter()
        v = chain(x0)
        assert np.isfinite(float(v))
        best = min(best, time.perf_counter() - t0)
    return 2 * rows * h * h * n / best / 1e12


def bench_dispatch_floor():
    """Per-iteration cost of a near-empty jitted step chained like every
    other measurement here (data-dependent carry, one readback per window):
    the relay's dispatch floor. Stages whose measured-minus-bound residue
    is of this order are dispatch-bound, not kernel-bound."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.float32)

    def fn(carry, x):
        return carry + jnp.sum(x) * 1e-9

    st = _chain_timer(fn, (x,), 50)
    return float(f"{st['min'] * 1e3:.4g}")


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
    # Headline (with-feed) train step FIRST: the peak benches leave the
    # relay's transfer path degraded for the rest of the process (measured:
    # the same with-feed loop is 50.8 ms after the peaks vs ~44 before,
    # device-resident unchanged), so the feed-sensitive measurement must
    # precede them. The end-of-run re-measure keeps the better period.
    train_stats, train_cost = bench_train_step(train_cfg, np_batch)

    # Hardware ceilings — they anchor the roofline rows.
    peak = bench_peak_tflops()
    peak_bw = bench_peak_hbm_gbs()
    train_s = train_stats["min"]
    train_edges_per_s = edges / train_s

    extra = {
        "train_step_ms": float(f"{train_s * 1e3:.4g}"),
        "train_step_ms_median": float(f"{train_stats['median'] * 1e3:.4g}"),
        "train_step_spread": float(f"{train_stats['spread']:.3g}"),
        "bench_windows": N_WINDOWS,
    }
    if train_cost and train_cost[0] is not None:
        extra["roofline_train_step"] = _roofline_row(
            "train_step", train_s, train_cost[0], train_cost[1], peak, peak_bw)
    # Whole-step decomposition + rooflines, one process (VERDICT r3 item 2).
    extra["step_decomposition"] = bench_step_decomposition(
        train_cfg, np_batch, peak, peak_bw)
    dev_ms = extra["step_decomposition"]["device_step"]["ms"]
    extra["train_step_device_ms"] = dev_ms
    extra["train_edges_per_s_device"] = float(f"{edges / (dev_ms / 1e3):.6g}")

    fwd_s = bench_forward(fwd_cfg, params, batch)
    extra["forward_edges_per_s"] = float(f"{edges / fwd_s:.6g}")
    extra.update(bench_stages(fwd_cfg, params, batch,
                              peak_tflops=peak, peak_gbs=peak_bw))
    extra.update(bench_sampler(fwd_cfg, params))
    extra.update(bench_spec_sampler(fwd_cfg, params))
    extra.update(bench_batch_design(fwd_cfg, params))
    extra.update(bench_long_forward(fwd_cfg, params))
    # Hardware context: the chip's amortized bf16 peak, HBM bandwidth, and
    # the achievable ceiling of the model's own H=128 matmul shape.
    extra["relay_peak_bf16_tflops"] = float(f"{peak:.4g}")
    extra["relay_peak_hbm_gbs"] = float(f"{peak_bw:.4g}")
    extra["relay_dispatch_floor_ms"] = bench_dispatch_floor()
    extra["shape_ceiling_h128_tflops"] = float(
        f"{bench_shape_ceiling_tflops():.4g}")
    extra["v5e_spec_scaled_train_edges_per_s_estimate"] = float(
        f"{train_edges_per_s * 197.0 / max(peak, 1e-9):.4g}")

    # The relay serves multi-minute degraded periods (same step measured
    # 73.7 vs 97 ms an hour apart; a round-5 run caught the sampler rows
    # 2x degraded while the decomposition section was clean); re-measure
    # the sampler/spec/batch-design sections AND the headline at the END
    # of the run and keep each metric's better period (equivalent to
    # best-of-more-windows spread over time).
    for fn in (bench_sampler, bench_spec_sampler, bench_batch_design):
        redo = fn(fwd_cfg, params)
        for k, v in redo.items():
            better = max if k.endswith("per_s") else min
            extra[k] = better(extra[k], v)
    train_stats2, _ = bench_train_step(train_cfg, np_batch)
    extra["train_step_ms_rerun"] = float(f"{train_stats2['min'] * 1e3:.4g}")
    extra["train_step_temporal_spread"] = float(
        f"{abs(train_stats2['min'] - train_s) / min(train_stats2['min'], train_s):.3g}")
    if train_stats2["min"] < train_s:
        train_s = train_stats2["min"]
        train_edges_per_s = edges / train_s
        extra["train_step_ms"] = float(f"{train_s * 1e3:.4g}")
        extra["train_step_ms_median"] = float(
            f"{train_stats2['median'] * 1e3:.4g}")
        extra["train_step_spread"] = float(f"{train_stats2['spread']:.3g}")
        if train_cost and train_cost[0] is not None:
            extra["roofline_train_step"] = _roofline_row(
                "train_step", train_s, train_cost[0], train_cost[1],
                peak, peak_bw)

    print(json.dumps({
        "metric": "mpnn_train_step_edges_per_s",
        "value": float(f"{train_edges_per_s:.6g}"),
        "unit": "edges/s/chip",
        "vs_baseline": float(f"{train_edges_per_s / BASELINE_EDGES_PER_S:.4g}"),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
