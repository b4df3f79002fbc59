"""Checkpoint I/O.

Three formats:
* native ``.npz`` — flattened parameter pytree (+ optimizer state / counters),
  dependency-free and fast; the single-host default;
* ``orbax`` directory checkpoints — save sharded ``jax.Array`` trees directly
  (each host writes its own shards; no host-0 gather) and restore under a new
  device topology. The multi-host-scale replacement for the reference's
  ``torch.save`` contract (na_run.py:339-353); enable with config key
  ``CHECKPOINT_FORMAT: "orbax"``;
* legacy reference ``.pt`` — torch checkpoints
  ({'model_state_dict', 'optimizer_state_dict', 'epoch', 'step', 'save_step'};
  reference na_run.py:339-353), loadable and writable for interchange.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.config import ModelConfig
from ..models.torch_import import to_torch_state_dict

_SEP = "/"


def flatten_pytree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_pytree(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint_npz(path: str, params, meta: Optional[Dict] = None,
                        opt_state_flat: Optional[Dict[str, np.ndarray]] = None):
    flat = {"params" + _SEP + k: v for k, v in flatten_pytree(params).items()}
    if opt_state_flat:
        flat.update({"opt" + _SEP + k: v for k, v in opt_state_flat.items()})
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint_npz(path: str) -> Tuple[Any, Dict, Dict[str, np.ndarray]]:
    data = dict(np.load(path, allow_pickle=False))
    meta = json.loads(bytes(data.pop("__meta__").tolist()).decode()) \
        if "__meta__" in data else {}
    params_flat = {k[len("params" + _SEP):]: v for k, v in data.items()
                   if k.startswith("params" + _SEP)}
    opt_flat = {k[len("opt" + _SEP):]: v for k, v in data.items()
                if k.startswith("opt" + _SEP)}
    return unflatten_pytree(params_flat), meta, opt_flat


_ORBAX_META = "na_mpnn_meta.json"


def save_checkpoint_orbax(path: str, params, meta: Optional[Dict] = None,
                          opt_state=None):
    """Write a directory checkpoint via orbax. ``params`` / ``opt_state``
    may hold live (sharded) jax.Arrays — orbax writes each host's
    addressable shards; there is no host-side gather."""
    import shutil

    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tree = {"params": params}
    if opt_state is not None:
        tree["opt"] = {f"leaf{i:04d}": v
                       for i, v in enumerate(jax.tree.leaves(opt_state))}
    tmp = path + ".tmp"
    primary = jax.process_index() == 0
    if primary and os.path.isdir(tmp):
        shutil.rmtree(tmp)
    if jax.process_count() > 1:
        # Orbax's save barriers internally, but the tmp cleanup above and
        # the meta/rename finalization below are filesystem ops only the
        # primary host may perform.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("orbax_tmp_clean")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, tree, force=True)
    if primary:
        with open(os.path.join(tmp, _ORBAX_META), "w") as f:
            json.dump(meta or {}, f)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("orbax_rename")


def load_checkpoint_orbax(path: str) -> Tuple[Any, Dict, Dict[str, np.ndarray]]:
    """Restore (params, meta, opt_flat) from an orbax directory checkpoint
    (opt_flat uses the same leaf-indexed layout as the .npz format)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    meta_path = os.path.join(path, _ORBAX_META)
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    return tree["params"], meta, dict(tree.get("opt", {}))


def load_params_any(path: str, cfg: ModelConfig):
    """Load model parameters from a native .npz, an orbax directory, or a
    reference .pt checkpoint. Returns (params, meta)."""
    if path.endswith(".pt") or path.endswith(".pth"):
        from ..models.torch_import import load_torch_checkpoint
        return load_torch_checkpoint(path, cfg)
    if os.path.isdir(path):
        params, meta, _ = load_checkpoint_orbax(path)
        return params, meta
    params, meta, _ = load_checkpoint_npz(path)
    return params, meta


def save_torch_checkpoint(path: str, params, cfg: ModelConfig,
                          meta: Optional[Dict] = None):
    """Export params to a reference-compatible .pt checkpoint."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(params, cfg).items()}
    payload = dict(meta or {})
    payload["model_state_dict"] = sd
    torch.save(payload, path)
