"""Training driver: JSON config -> pjit train loop with metrics/checkpoints.

Equivalent of the reference driver (reference na_run.py) re-designed for TPU:
* one jitted train step (forward + loss + grad + Noam-Adam update) with
  donated params/opt-state, compiled once per length bucket;
* data parallelism over a `jax.sharding.Mesh` "data" axis — batches are
  sharded across chips with NamedSharding; gradients are combined by XLA's
  automatic collectives (this replaces the reference's single-GPU loop;
  no NCCL — ICI collectives are inserted by the compiler);
* device-side metric accumulation (one host transfer per epoch);
* npz checkpoints with the reference payload (epoch/step/save_step) plus
  optional reference-format .pt export.

The reference's AMP GradScaler (na_run.py:21,216-237) is replaced by bf16
compute policy: TPUs do bf16 matmuls natively with fp32 accumulation, so no
loss scaling is required.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ModelConfig, forward, init_params
from .checkpoint import load_checkpoint_npz, save_checkpoint_npz

from .losses import (compute_canonical_base_pair_accuracy, loss_nll,
                     loss_smoothed, make_polymer_restype_masks, mask_for_loss)
from .metrics import generate_metric_manager
from .optimizer import make_optimizer


def model_config_from_params(params: Dict) -> ModelConfig:
    """Build a ModelConfig from a reference-style JSON param dict
    (schema: design_model.json:1-56)."""
    return ModelConfig(
        node_features=params.get("HIDDEN_DIM", 128),
        edge_features=params.get("HIDDEN_DIM", 128),
        hidden_dim=params.get("HIDDEN_DIM", 128),
        num_encoder_layers=params.get("NUM_ENCODER_LAYERS", 3),
        num_decoder_layers=params.get("NUM_DECODER_LAYERS", 3),
        k_neighbors=params.get("NUM_NEIGHBORS", 32),
        vocab=params.get("VOCAB_SIZE", 33),
        num_letters=params.get("NUM_LETTERS", 33),
        dropout=params.get("DROPOUT", 0.1),
        protein_augment_eps=params.get("PROTEIN_BACKBONE_NOISE", 0.1),
        dna_augment_eps=params.get("DNA_BACKBONE_NOISE", 0.1),
        rna_augment_eps=params.get("RNA_BACKBONE_NOISE", 0.1),
        decode_protein_first=bool(params.get("DECODE_PROTEIN_FIRST", 0)),
        na_ref_atom=params.get("NA_REF_ATOM", "C1'"),
        include_pred_na_N=bool(params.get("INCLUDE_PRED_NA_N", 1)),
        # MIXED_PRECISION (na_run.py:216-237 AMP) -> bf16 trunk policy.
        compute_dtype=("bfloat16" if params.get("MIXED_PRECISION", 1)
                       else "float32"),
        atom_table=params.get("ATOMS_TO_LOAD", "backbone"),
    )


BATCH_KEYS = [
    "X", "X_m", "mask", "S", "R_idx", "chain_labels", "protein_mask",
    "dna_mask", "rna_mask", "R_polymer_type", "interface_mask",
    "base_pair_mask", "base_pair_index", "canonical_base_pair_mask",
    "canonical_base_pair_index", "aligned_ppm", "ppm_mask",
]


class Trainer:
    """Owns params/opt-state and the jitted train/eval steps."""

    def __init__(self, cfg: ModelConfig, label_smoothing=0.1, loss_tokens=6000.0,
                 grad_clip_norm=1.0, na_shared_tokens=True, seed=0,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 per_host_feed: bool = False):
        self.cfg = cfg
        self.label_smoothing = label_smoothing
        self.loss_tokens = loss_tokens
        self.na_shared_tokens = na_shared_tokens
        self.restype_masks = make_polymer_restype_masks(na_shared_tokens)
        self.optimizer = make_optimizer(cfg.hidden_dim, grad_clip_norm=grad_clip_norm)
        self.mesh = mesh
        # Multi-host per-host feed (VERDICT r4 item 5): each process hands
        # train_step only its local "data"-axis rows; the global array is
        # assembled with jax.make_array_from_process_local_data — no host
        # ever materializes (or parses) the whole global batch. Requires a
        # pure-DP batch layout across processes (the "graph" axis, if any,
        # must live within a process).
        self.per_host_feed = bool(per_host_feed) and jax.process_count() > 1

        key = jax.random.PRNGKey(seed)
        self.params = init_params(key, cfg)
        # The optimizer runs FUSED over one raveled parameter vector: per-leaf
        # Adam over the 371-leaf tree emits ~3000 tiny HLO ops and measured
        # 2.4 ms/step standalone (2.8% of its roofline bound); one flat
        # [P]-vector Adam is ~10 ops. Same math elementwise; the global-norm
        # clip reduces over one vector instead of per-leaf partials (same
        # value up to float reduction order).
        from jax.flatten_util import ravel_pytree
        flat0, self._unravel_params = ravel_pytree(self.params)
        self.opt_state = self.optimizer.init(flat0)
        self.step = 0

        # Edge-partitioned (graph-parallel) training when the mesh carries a
        # non-trivial "graph" axis: the train step runs the shard_map forward
        # of parallel.graph_parallel with L sharded across it (SURVEY §2.3 —
        # the SP/CP analog replacing the reference's spatial cropping).
        self.graph_parallel = (mesh is not None
                               and dict(mesh.shape).get("graph", 1) > 1)

        if mesh is not None:
            # Replicate params/opt state, shard batches on the data axis
            # (and the residue axis when graph-parallel).
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.param_sharding = NamedSharding(mesh, P())
            if self.graph_parallel:
                self.batch_sharding = NamedSharding(mesh, P("data", "graph"))
            else:
                self.batch_sharding = NamedSharding(mesh, P("data"))
            self._batch_sharding_1d = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(self.params, self.param_sharding)
            self.opt_state = jax.device_put(self.opt_state, self.param_sharding)
        else:
            self.param_sharding = None
            self.batch_sharding = None

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)
        # Packed-feed variants keyed by batch layout (one per shape bucket).
        self._packed_steps = {}
        # Coordinate quantization over the wire is only lossless-in-effect
        # when training adds backbone noise that dwarfs the 0.005 A rounding;
        # a noise-free fine-tune config must ship X as f32 (advisor r4).
        # NA_MPNN_PACK_X=q16|f32 overrides the automatic gate.
        pack_x = os.environ.get("NA_MPNN_PACK_X", "auto")
        if pack_x == "q16":
            self._quantize_x = True
        elif pack_x == "f32":
            self._quantize_x = False
        else:
            self._quantize_x = min(cfg.protein_augment_eps,
                                   cfg.dna_augment_eps,
                                   cfg.rna_augment_eps) >= 0.05
        # Per-key wire-format pins: once a key is seen nonzero it is always
        # transferred, and integer widths only ever widen — so a batch
        # oscillating across a narrowing threshold cannot force recompiles.
        self._wire_pins: Dict[str, str] = {}

    # -- loss ------------------------------------------------------------

    def _loss_fn(self, params, batch, key):
        if self.graph_parallel:
            from ..parallel.graph_parallel import forward_graph_parallel
            log_probs = forward_graph_parallel(params, self.cfg, batch,
                                               self.mesh, key=key,
                                               deterministic=False)
        else:
            log_probs, _ = forward(params, self.cfg, batch, key=key,
                                   deterministic=False)
        mfl = mask_for_loss(batch["S"], batch["mask"], self.na_shared_tokens)
        mfl = mfl.astype(jnp.float32)
        polymer_masks = {"protein": batch["protein_mask"],
                         "dna": batch["dna_mask"], "rna": batch["rna_mask"]}
        loss_per_token, loss_av = loss_smoothed(
            batch["S"], log_probs, mfl, polymer_masks, self.restype_masks,
            weight=self.label_smoothing, tokens=self.loss_tokens,
            num_letters=self.cfg.num_letters,
            ppm_mask=batch["ppm_mask"], aligned_ppm=batch["aligned_ppm"])
        return loss_av, (log_probs, mfl, loss_per_token)

    def _metrics_from_logprobs(self, batch, log_probs, mfl,
                               loss_per_token=None):
        _, _, true_false = loss_nll(batch["S"], log_probs, mfl)
        cbp_acc = compute_canonical_base_pair_accuracy(
            log_probs, batch["canonical_base_pair_mask"],
            batch["canonical_base_pair_index"], self.na_shared_tokens)
        if loss_per_token is None:
            polymer_masks = {"protein": batch["protein_mask"],
                             "dna": batch["dna_mask"], "rna": batch["rna_mask"]}
            loss_per_token, _ = loss_smoothed(
                batch["S"], log_probs, mfl, polymer_masks, self.restype_masks,
                weight=self.label_smoothing, tokens=self.loss_tokens,
                num_letters=self.cfg.num_letters,
                ppm_mask=batch["ppm_mask"], aligned_ppm=batch["aligned_ppm"])
        loss_metric = loss_per_token
        return {
            "loss_per_token": loss_metric.astype(jnp.float32),
            "accuracy": true_false,
            "cbp_accuracy": cbp_acc,
            "S_pred": jnp.argmax(log_probs, axis=-1),
            "mask_for_loss": mfl,
        }

    def _train_step_impl(self, params, opt_state, batch, key):
        (loss_av, (log_probs, mfl, loss_per_token)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(params, batch, key)
        from jax.flatten_util import ravel_pytree
        flat_grads, _ = ravel_pytree(grads)
        updates_flat, opt_state = self.optimizer.update(flat_grads, opt_state)
        import optax
        params = optax.apply_updates(params,
                                     self._unravel_params(updates_flat))
        # loss_per_token rides the loss aux — the metric table reuses it
        # instead of recomputing loss_smoothed.
        metrics = self._metrics_from_logprobs(batch, log_probs, mfl,
                                              loss_per_token=loss_per_token)
        metrics["loss_av"] = loss_av
        return params, opt_state, metrics

    def _eval_step_impl(self, params, batch):
        log_probs, _ = forward(params, self.cfg, batch, deterministic=True)
        mfl = mask_for_loss(batch["S"], batch["mask"], self.na_shared_tokens)
        return self._metrics_from_logprobs(batch, log_probs, mfl.astype(jnp.float32))

    # -- public API --------------------------------------------------------

    def _device_batch(self, np_batch):
        arrays = {k: np_batch[k] for k in BATCH_KEYS if k in np_batch}
        if any(isinstance(v, jax.Array) for v in arrays.values()):
            return arrays  # caller already placed/sharded the batch
        if self.per_host_feed and self.batch_sharding is not None:
            # np_batch carries ONLY this process's B-rows; build the global
            # sharded array from the per-process slices (B_global =
            # B_local * process_count along the "data" axis).
            return {k: jax.make_array_from_process_local_data(
                        self.batch_sharding, np.asarray(v))
                    for k, v in arrays.items()}
        if self.batch_sharding is not None:
            return {k: jax.device_put(v, self.batch_sharding) for k, v in arrays.items()}
        return {k: jnp.asarray(v) for k, v in arrays.items()}

    # -- packed feed -------------------------------------------------------
    # The relay pays a fixed enqueue/transfer latency PER ARRAY; feeding the
    # ~17 batch arrays separately cost ~18 ms/step at the 6000-token shape
    # (measured round 4: 73.3 ms with feed vs 55.3 ms device-resident).
    # Packing the whole batch into ONE uint8 buffer host-side (a ~3 MB
    # memcpy) and bitcasting it back inside the jitted step collapses that
    # to a single transfer.

    # The relay's H2D path compresses content (measured: a 720 KB buffer of
    # zeros ships ~free behind a busy device, random bytes cost ~14 ms, small
    # values ~5 ms), so the wire formats minimize ENTROPY as well as bytes:
    # 0/1 masks ride bit-packed ("bits*", 8x fewer near-incompressible
    # bytes), and quantized coordinates ride residue-to-residue DELTAS split
    # into byte planes ("q16x100d": the high-byte plane of backbone deltas is
    # almost all 0/-1, which the relay's compressor collapses).
    _WIRE_WIDTH = {"zero": -1, "bits": 0, "uint8": 1, "int16": 2,
                   "q16x100": 2, "q16x100d": 2, "int32": 3, "float32": 3}

    def _pack_np_batch(self, np_batch):
        """(packed uint8 [N], static layout) for one host->device transfer,
        or (None, None) when a batch array has an unsupported dtype (caller
        falls back to the direct per-array path).

        The tunnel's H2D path is bandwidth-bound (~170 MB/s measured) and
        does not overlap device execution, so feed cost is proportional to
        bytes. Three lossless reductions: int64/float64/bool normalize to
        their 4-byte types (the same narrowing jnp.asarray applies under
        default x64-disabled mode); integer arrays narrow to the smallest
        of uint8/int16/int32 that holds their range exactly; all-zero
        arrays (e.g. aligned_ppm when no PPMs are attached — 0.8 MB of
        zeros per 6000-token batch) are not transferred at all and
        materialize as jnp.zeros on device. The layout is static per
        (shape, dtype, zero/width) signature — one compile per bucket —
        and per-key formats are pinned monotonically (never re-narrowed,
        never re-zero-skipped) so layouts converge instead of oscillating."""
        parts, layout, off = [], [], 0
        norm = {np.dtype(np.int64): np.int32, np.dtype(np.float64): np.float32,
                np.dtype(np.bool_): np.int32}
        for k in BATCH_KEYS:
            if k not in np_batch:
                continue
            a = np.asarray(np_batch[k])
            a = a.astype(norm.get(a.dtype, a.dtype), copy=False)
            if a.dtype.itemsize != 4:
                return None, None
            pin = self._wire_pins.get(k)
            if not a.any() and pin is None:
                layout.append((k, a.dtype.name, a.shape, "zero", 0, 0))
                continue
            wire = a
            wire_name = a.dtype.name
            if a.dtype == np.int32:
                lo, hi = int(a.min()), int(a.max())
                if 0 <= lo and hi <= 1:
                    wire_name = "bits"
                elif 0 <= lo and hi <= 255:
                    wire_name = "uint8"
                elif -32768 <= lo and hi <= 32767:
                    wire_name = "int16"
            elif (k == "X" and a.dtype == np.float32 and self._quantize_x
                  and np.abs(a).max() < 327.0):
                # Coordinates ride as 0.01-Angstrom fixed-point int16 (the
                # <=0.005 A rounding is >=10x below the gated-on backbone
                # noise, see __init__), DELTA-coded along the residue axis
                # and split into byte planes so the relay's compressing
                # transfer path sees a near-constant high-byte plane.
                # Structures outside +-327 A keep f32.
                wire_name = "q16x100d" if a.ndim >= 2 else "q16x100"
            # Monotonic widening against the pin (zero counts as narrowest).
            if pin is not None and (self._WIRE_WIDTH[pin]
                                    >= self._WIRE_WIDTH[wire_name]):
                wire_name = pin
            self._wire_pins[k] = wire_name
            if wire_name == "q16x100":
                wire = np.round(a * 100.0).astype(np.int16)
            elif wire_name == "q16x100d":
                q = np.round(a * 100.0).astype(np.int16)
                # Wraparound int16 delta along L (axis 1): exact under the
                # device-side wrapping cumsum (values mod 2^16 round-trip).
                d = q.copy()
                d[:, 1:] -= q[:, :-1]
                u = d.view(np.uint16)
                wire = np.concatenate(
                    [(u & 0xFF).astype(np.uint8).reshape(-1),
                     (u >> 8).astype(np.uint8).reshape(-1)])
            elif wire_name == "bits":
                # 0/1 arrays bit-packed along the last axis (little-endian:
                # bit j of byte b is element 8*b + j).
                wire = np.packbits(a.astype(np.uint8), axis=-1,
                                   bitorder="little")
            elif wire_name != a.dtype.name:
                wire = a.astype(np.dtype(wire_name))
            b = np.ascontiguousarray(wire).view(np.uint8).reshape(-1)
            layout.append((k, a.dtype.name, a.shape, wire_name, off, b.size))
            parts.append(b)
            off += b.size
        return (np.concatenate(parts) if parts
                else np.zeros((1,), np.uint8)), tuple(layout)

    @staticmethod
    def _unpack_batch(packed, layout):
        out = {}
        for k, dtype_name, shape, wire, off, size in layout:
            if wire == "zero":
                out[k] = jnp.zeros(shape, jnp.dtype(dtype_name))
                continue
            seg = jax.lax.slice(packed, (off,), (off + size,))
            if wire == "q16x100":
                v = jax.lax.bitcast_convert_type(seg.reshape(-1, 2),
                                                 jnp.int16)
                out[k] = v.reshape(shape).astype(jnp.float32) * 0.01
                continue
            if wire == "q16x100d":
                # Byte planes -> u16 deltas -> wrapping cumsum along the
                # residue axis -> int16 truncation (exact mod-2^16 inverse
                # of the packer's wraparound delta).
                n = size // 2
                lo = seg[:n].astype(jnp.int32)
                hi = seg[n:].astype(jnp.int32)
                v = (lo | (hi << 8)).reshape(shape)
                c = jnp.cumsum(v, axis=1)
                out[k] = c.astype(jnp.int16).astype(jnp.float32) * 0.01
                continue
            if wire == "bits":
                nbytes = -(-shape[-1] // 8)
                b = seg.reshape(shape[:-1] + (nbytes,))
                shifts = jax.lax.broadcasted_iota(jnp.uint8, (8,), 0)
                bits = (b[..., None] >> shifts) & jnp.uint8(1)
                bits = bits.reshape(shape[:-1] + (nbytes * 8,))
                out[k] = bits[..., :shape[-1]].astype(jnp.dtype(dtype_name))
                continue
            wdt = np.dtype(wire)
            if wdt.itemsize == 1:
                val = seg
            else:
                val = jax.lax.bitcast_convert_type(
                    seg.reshape(-1, wdt.itemsize), jnp.dtype(wire))
            out[k] = val.reshape(shape).astype(jnp.dtype(dtype_name))
        return out

    def _packed_step_fn(self, layout):
        fn = self._packed_steps.get(layout)
        if fn is None:
            def impl(params, opt_state, packed, key):
                batch = self._unpack_batch(packed, layout)
                return self._train_step_impl(params, opt_state, batch, key)

            fn = jax.jit(impl, donate_argnums=(0, 1))
            self._packed_steps[layout] = fn
        return fn

    def train_step(self, np_batch, key):
        arrays = {k: np_batch[k] for k in BATCH_KEYS if k in np_batch}
        packed = layout = None
        if (self.batch_sharding is None
                and not any(isinstance(v, jax.Array) for v in arrays.values())):
            packed, layout = self._pack_np_batch(arrays)
        if layout is not None:
            fn = self._packed_step_fn(layout)
            self.params, self.opt_state, metrics = fn(
                self.params, self.opt_state, jnp.asarray(packed), key)
        else:
            batch = self._device_batch(np_batch)
            self.params, self.opt_state, metrics = self._train_step(
                self.params, self.opt_state, batch, key)
        self.step += 1
        return metrics

    def step_cost_analysis(self, np_batch, key=None):
        """XLA-reported (flops, bytes accessed) for the jitted train step at
        this batch's shapes — feeds the bench roofline. Returns (None, None)
        if the backend does not expose cost analysis."""
        import jax

        if key is None:
            key = jax.random.PRNGKey(0)
        try:
            c = self._train_step.lower(
                self.params, self.opt_state, self._device_batch(np_batch),
                key).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return (float(c.get("flops", 0.0)),
                    float(c.get("bytes accessed", 0.0)))
        except Exception:
            return (None, None)

    # -- profiling ---------------------------------------------------------

    def profile_steps(self, np_batch, key, out_dir: str, n_steps: int = 3):
        """Capture a jax.profiler trace of n_steps train steps into out_dir
        (viewable with TensorBoard / Perfetto; SURVEY §5 tracing row — the
        reference has only wall-clock prints, na_run.py:197,275)."""
        import jax.profiler

        self.train_step(np_batch, key)  # compile outside the trace
        with jax.profiler.trace(out_dir):
            for i in range(n_steps):
                m = self.train_step(np_batch, jax.random.fold_in(key, i + 1))
            jax.block_until_ready(m)
        return out_dir

    def eval_step(self, np_batch):
        batch = self._device_batch(np_batch)
        return self._eval_step(self.params, batch)

    # -- checkpointing -------------------------------------------------------

    def save(self, path: str, epoch: int, save_step: int):
        meta = {"epoch": epoch, "step": self.step, "save_step": save_step}
        if not path.endswith(".npz"):
            # Orbax directory checkpoint: hand over the live (possibly
            # sharded) jax.Arrays — every host writes its own shards.
            from .checkpoint import save_checkpoint_orbax
            save_checkpoint_orbax(path, self.params, meta=meta,
                                  opt_state=self.opt_state)
            return
        # ONE batched device->host fetch for the whole state: per-leaf
        # np.asarray costs a full relay round trip per leaf (371 leaves
        # measured 20.7 s; device_get pipelines the copies, ~0.3 s).
        params_host, opt_host = jax.device_get((self.params, self.opt_state))
        # Optimizer state is stored by leaf position — optax states contain
        # empty containers that a name-based flattening cannot round-trip.
        opt_flat = {f"leaf{i:04d}": np.asarray(v)
                    for i, v in enumerate(jax.tree.leaves(opt_host))}
        save_checkpoint_npz(path, params_host, meta=meta,
                            opt_state_flat=opt_flat)

    def restore(self, path: str) -> Dict:
        if os.path.isdir(path):
            from .checkpoint import load_checkpoint_orbax
            params, meta, opt_flat = load_checkpoint_orbax(path)
        else:
            params, meta, opt_flat = load_checkpoint_npz(path)
        self.params = jax.tree.map(jnp.asarray, params)
        if opt_flat:
            flat_target, treedef = jax.tree.flatten(self.opt_state)
            loaded = [np.asarray(opt_flat[f"leaf{i:04d}"])
                      for i in range(len(opt_flat))]
            if len(loaded) != len(flat_target):
                # Legacy per-leaf optimizer checkpoint (count, mu x N_leaves,
                # nu x N_leaves, schedule count) -> fused flat layout
                # (count, mu_flat, nu_flat, count): each flat moment vector
                # is the tree-order concatenation of the raveled per-leaf
                # moments — the exact ravel_pytree order.
                n = (len(loaded) - 2) // 2
                assert len(loaded) == 2 * n + 2, \
                    f"optimizer state mismatch ({len(loaded)} leaves)"
                mu = np.concatenate([x.reshape(-1) for x in loaded[1:1 + n]])
                nu = np.concatenate(
                    [x.reshape(-1) for x in loaded[1 + n:1 + 2 * n]])
                loaded = [loaded[0], mu, nu, loaded[-1]]
                assert len(loaded) == len(flat_target), "optimizer state mismatch"
                assert mu.size == np.size(flat_target[1]), \
                    (mu.size, np.size(flat_target[1]))
            self.opt_state = jax.tree.unflatten(
                treedef, [jnp.asarray(x) for x in loaded])
        self.step = int(meta.get("step", 0))
        if self.param_sharding is not None:
            self.params = jax.device_put(self.params, self.param_sharding)
            self.opt_state = jax.device_put(self.opt_state, self.param_sharding)
        return meta


def run_training(config_path_or_dict, max_epochs: Optional[int] = None,
                 steps_override: Optional[int] = None):
    """Full training loop from a reference-style JSON config
    (reference na_run.py top level)."""
    import pandas as pd

    if isinstance(config_path_or_dict, str):
        params_json = json.load(open(config_path_or_dict))
    else:
        params_json = dict(config_path_or_dict)
    p = params_json

    base = p["BASE_FOLDER"]
    if base[-1] != "/":
        base += "/"
    os.makedirs(base, exist_ok=True)
    logfile = base + "log.txt"
    jsonl_log = base + "log.jsonl"
    if not p.get("PREV_CHECKPOINT"):
        with open(logfile, "w") as f:
            f.write("Epoch\tTrain\tValidation\n")

    from ..data.dataset import DatasetConfig, NADataset, make_batch_iter
    from ..data.parsers import make_parsers

    from .. import constants
    atoms = (constants.ALL_ATOMS if p.get("ATOMS_TO_LOAD") == "all"
             else constants.BACKBONE_ATOMS)  # reference na_run.py:34-41
    ds_cfg = DatasetConfig(
        atom_list_to_save=tuple(atoms),
        parse_protein=bool(p["PARSE_PROTEIN"]), parse_dna=bool(p["PARSE_DNA"]),
        parse_rna=bool(p["PARSE_RNA"]),
        parse_rna_as_dna=bool(p["PARSE_RNA_AS_DNA"]),
        na_shared_tokens=bool(p["NA_SHARED_TOKENS"]),
        protein_backbone_occ_cutoff=p["PROTEIN_BACKBONE_OCC_CUTOFF"],
        protein_side_chain_occ_cutoff=p["PROTEIN_SIDE_CHAIN_OCC_CUTOFF"],
        dna_backbone_occ_cutoff=p["DNA_BACKBONE_OCC_CUTOFF"],
        dna_side_chain_occ_cutoff=p["DNA_SIDE_CHAIN_OCC_CUTOFF"],
        rna_backbone_occ_cutoff=p["RNA_BACKBONE_OCC_CUTOFF"],
        rna_side_chain_occ_cutoff=p["RNA_SIDE_CHAIN_OCC_CUTOFF"],
        crop_large_structures=bool(p["CROP_LARGE_STRUCTURES"]),
        batch_tokens=p["BATCH_TOKENS"], na_ref_atom=p["NA_REF_ATOM"],
        parse_ppms=bool(p["PARSE_PPMS"]),
        min_overlap_length=p["MIN_OVERLAP_LENGTH"],
        drop_protein_probability=p["DROP_PROTEIN_PROBABILITY"],
        na_only_as_uniform_ppm=bool(p["NA_ONLY_AS_UNIFORM_PPM"]),
        protein_interface_residue_mutation_probability=p[
            "PROTEIN_INTERFACE_RESIDUE_MUTATION_PROBABILITY"],
        mutate_base_pair_together=bool(p["MUTATE_BASE_PAIR_TOGETHER"]),
        mutate_entire_side_chain_interface_probability=p[
            "MUTATE_ENTIRE_SIDE_CHAIN_INTERFACE_PROBABILITY"],
        na_non_interface_as_uniform_ppm=bool(p["NA_NON_INTERFACE_AS_UNIFORM_PPM"]),
    )
    cif_parser, pdb_parser = make_parsers(
        skip_res=p.get("EXCLUDE_RES", []),
        randomize_nmr_model=bool(p.get("RANDOMIZE_NMR_MODEL", 0)))
    dataset = NADataset(cif_parser=cif_parser, pdb_parser=pdb_parser, config=ds_cfg)

    # Multi-host bring-up from the launcher's env (scripts/launch_training.sh),
    # then a data-parallel mesh over every available chip.
    num_processes = int(os.environ.get("NA_MPNN_NUM_PROCESSES", "1"))
    if num_processes > 1:
        from ..parallel.mesh import initialize_distributed
        initialize_distributed(os.environ.get("NA_MPNN_COORDINATOR_ADDRESS"),
                               num_processes,
                               int(os.environ.get("NA_MPNN_PROCESS_ID", "0")))
    mesh = None
    if jax.device_count() > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(graph_axis=int(p.get("MESH_GRAPH_AXIS", 1)))

    cfg = model_config_from_params(p)
    # Per-host data feed (default on for multi-process runs; opt out with
    # PER_HOST_FEED=0): each host parses/collates only its "data"-axis rows
    # and the global batch is assembled from the per-process slices.
    per_host_feed = (jax.process_count() > 1
                     and bool(p.get("PER_HOST_FEED", 1))
                     and int(p.get("MESH_GRAPH_AXIS", 1)) == 1)
    trainer = Trainer(cfg, label_smoothing=p["LABEL_SMOOTHING"],
                      loss_tokens=float(p["LOSS_TOKENS"]),
                      grad_clip_norm=p["GRADIENT_NORM"],
                      na_shared_tokens=bool(p["NA_SHARED_TOKENS"]),
                      seed=int(p.get("SEED", 0)), mesh=mesh,
                      per_host_feed=per_host_feed)

    epoch0, save_step = 0, 0
    if p.get("PREV_CHECKPOINT"):
        try:
            meta = trainer.restore(p["PREV_CHECKPOINT"])
            epoch0 = int(meta.get("epoch", 0))
            save_step = int(meta.get("save_step", 0))
            print(f"Starting from step {trainer.step}")
        except Exception as e:
            print(f"LOADING FROM BAD PATH CHECKPOINT ({type(e).__name__}: {e})")

    df_train = pd.read_csv(p["DF_PATH_TRAIN"])
    df_valid = pd.read_csv(p["DF_PATH_VALID"])
    df_train["date"] = pd.to_datetime(df_train["date"], format="%Y-%m-%d")
    df_valid["date"] = pd.to_datetime(df_valid["date"], format="%Y-%m-%d")
    date_cutoff = pd.to_datetime(p["DATE_CUTOFF"], format="%Y-%m-%d")

    metric_manager = generate_metric_manager(
        dataset.restype_to_int, metrics_to_compute=p["METRICS_TO_COMPUTE"])
    use_interface = p["METRICS_TO_COMPUTE"] == "all"

    total_steps = steps_override or p["TOTAL_STEPS"]
    seed = int(p.get("SEED", 0))
    base_key = jax.random.PRNGKey(seed)
    # Optional profiler capture of the first train batches (config key
    # PROFILE_DIR or env NA_MPNN_PROFILE_DIR) — SURVEY §5 tracing.
    profile_state = {"dir": p.get("PROFILE_DIR")
                     or os.environ.get("NA_MPNN_PROFILE_DIR"), "done": False}

    # Persistent per-split loaders: the worker pool (and each worker's
    # parse cache) survives across epochs; only the epoch's cluster list is
    # swapped in (loader.set_clusters).
    from ..data.loader import PrefetchLoader
    loaders = {}

    def get_loader(split, batch_iter):
        if split not in loaders:
            loaders[split] = PrefetchLoader(
                dataset, batch_iter, num_workers=int(p.get("NUM_WORKERS", 0)),
                # Batch dim must divide the data-parallel axis; padded rows
                # are fully masked (PAD tokens carry no loss).
                pad_batch_multiple=mesh.shape["data"] if mesh is not None else None,
                shard=((jax.process_index(), jax.process_count())
                       if per_host_feed else None))
        else:
            loaders[split].set_clusters(batch_iter)
        return loaders[split]

    epoch = epoch0
    while True:
        metric_manager.zero_metrics()
        t0 = time.time()
        # Every per-epoch random stream (device noise/dropout keys, cluster
        # sampling, batch order) is a deterministic function of (seed,
        # epoch), so a run restored from the epoch-boundary checkpoint
        # replays the interrupted epoch EXACTLY — the preemption-resume
        # contract (role of reference na_run.py:94-117,339-353).
        key = jax.random.fold_in(base_key, epoch)

        def run_split(df, max_pdbs, split):
            nonlocal key
            split_rng = np.random.RandomState(
                (seed * 1000003 + epoch * 31 + (0 if split == "train" else 1))
                % (2 ** 31))
            batch_iter = make_batch_iter(
                df, p["BATCH_TOKENS"], p["MIN_PROTEIN_LENGTH_CUTOFF"],
                date_cutoff, bool(p["CROP_LARGE_STRUCTURES"]), max_pdbs,
                rng=split_rng)
            loader = get_loader(split, batch_iter)
            for np_batch in loader:
                if per_host_feed:
                    from ..parallel.mesh import sync_batch_length
                    np_batch = sync_batch_length(np_batch)
                if use_interface:
                    interface = {"interface": jnp.asarray(np_batch["interface_mask"]),
                                 "nonInterface": 1 - jnp.asarray(np_batch["interface_mask"])}
                else:
                    interface = {}
                if split == "train":
                    key, sub = jax.random.split(key)
                    if profile_state.get("dir") and not profile_state.get("done"):
                        trainer.profile_steps(np_batch, sub, profile_state["dir"])
                        profile_state["done"] = True
                    m = trainer.train_step(np_batch, sub)
                else:
                    m = trainer.eval_step(np_batch)
                polymer_masks = {"protein": jnp.asarray(np_batch["protein_mask"]),
                                 "dna": jnp.asarray(np_batch["dna_mask"]),
                                 "rna": jnp.asarray(np_batch["rna_mask"])}
                metric_manager.accumulate(
                    m["loss_per_token"], m["accuracy"], m["cbp_accuracy"],
                    jnp.asarray(np_batch["canonical_base_pair_mask"]),
                    jnp.asarray(np_batch["S"]), m["S_pred"], split,
                    m["mask_for_loss"], polymer_masks, interface)

        run_split(df_train, p["MAX_NUMBER_OF_PDBS_TRAIN"], "train")
        # One scalar readback so train_time covers the queued device work
        # (on the relay, only a readback forces execution) — keeps the
        # per-epoch train_time honest against device-only measurements.
        np.asarray(jax.tree.leaves(trainer.params)[0])[:1]
        t1 = time.time()
        run_split(df_valid, p["MAX_NUMBER_OF_PDBS_VALID"], "valid")
        t2 = time.time()

        if per_host_feed:
            metric_manager.all_reduce_across_hosts()
        metric_manager.compute_metrics()
        out_str = metric_manager.create_print_string(
            epoch, trainer.step,
            np.format_float_positional(np.float32(t1 - t0), unique=False, precision=3),
            np.format_float_positional(np.float32(t2 - t1), unique=False, precision=3))
        with open(logfile, "a") as f:
            f.write(out_str + "\n")
        with open(jsonl_log, "a") as f:
            f.write(json.dumps({"epoch": epoch + 1, "step": trainer.step,
                                **metric_manager.as_dict()}) + "\n")
        print(out_str)

        ext = ".orbax" if p.get("CHECKPOINT_FORMAT") == "orbax" else ".npz"
        trainer.save(base + "last" + ext, epoch + 1, save_step)
        if trainer.step > save_step + p["SAVE_EVERY_N_STEPS"]:
            save_step += p["SAVE_EVERY_N_STEPS"]
            trainer.save(base + f"s_{trainer.step}{ext}", epoch + 1, save_step)
        epoch += 1
        if trainer.step > total_steps:
            break
        if max_epochs is not None and (epoch - epoch0) >= max_epochs:
            break
    for loader in loaders.values():
        loader.close()
    return trainer
