"""Import reference PyTorch NA-MPNN checkpoints into the JAX parameter pytree.

The reference state_dict layout is defined by ProteinMPNN in
reference na_model_utils.py:519-587 (training) and the identically-named
inference variant (inference/model_utils.py:8-69). Checkpoint files store
{"model_state_dict": ...} plus step counters (reference na_run.py:339-353).

torch Linear weights are [out, in]; we store [in, out], so every "weight"
except the embedding table is transposed.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from .config import ModelConfig


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Mapping, prefix: str):
    p = {"w": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def _norm(sd: Mapping, prefix: str):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _pff(sd: Mapping, prefix: str):
    return {"W_in": _linear(sd, prefix + ".W_in"),
            "W_out": _linear(sd, prefix + ".W_out")}


def _enc_layer(sd: Mapping, prefix: str):
    p = {name: _linear(sd, f"{prefix}.{name}")
         for name in ["W1", "W2", "W3", "W11", "W12", "W13"]}
    for name in ["norm1", "norm2", "norm3"]:
        p[name] = _norm(sd, f"{prefix}.{name}")
    p["dense"] = _pff(sd, prefix + ".dense")
    return p


def _dec_layer(sd: Mapping, prefix: str):
    p = {name: _linear(sd, f"{prefix}.{name}") for name in ["W1", "W2", "W3"]}
    for name in ["norm1", "norm2"]:
        p[name] = _norm(sd, f"{prefix}.{name}")
    p["dense"] = _pff(sd, prefix + ".dense")
    return p


def from_torch_state_dict(sd: Mapping, cfg: ModelConfig):
    """Convert a reference model_state_dict into our parameter pytree
    (numpy leaves; jnp-compatible)."""
    params = {
        "features": {
            "positional": _linear(sd, "features.embeddings.linear"),
            "node_embedding": _linear(sd, "features.node_embedding"),
            "norm_nodes": _norm(sd, "features.norm_nodes"),
            "edge_embedding": _linear(sd, "features.edge_embedding"),
            "norm_edges": _norm(sd, "features.norm_edges"),
        },
        "W_v": _linear(sd, "W_v"),
        "W_e": _linear(sd, "W_e"),
        "W_s": {"emb": _np(sd["W_s.weight"])},
        "W_out": _linear(sd, "W_out"),
        "encoder": [_enc_layer(sd, f"encoder_layers.{i}")
                    for i in range(cfg.num_encoder_layers)],
        "decoder": [_dec_layer(sd, f"decoder_layers.{i}")
                    for i in range(cfg.num_decoder_layers)],
    }
    return params


def load_torch_checkpoint(path: str, cfg: ModelConfig):
    """Load a reference .pt checkpoint file -> (params, metadata dict)."""
    import torch  # local import; torch is only needed for legacy checkpoints

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    meta = {k: ckpt[k] for k in ("epoch", "step", "save_step") if k in ckpt} \
        if isinstance(ckpt, dict) else {}
    return from_torch_state_dict(sd, cfg), meta


def to_torch_state_dict(params, cfg: ModelConfig):
    """Export our parameter pytree to a reference-layout state_dict
    (numpy arrays; caller may wrap in torch tensors). Inverse of
    from_torch_state_dict — useful for checkpoint interchange."""
    sd = {}

    def put_linear(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    def put_norm(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    f = params["features"]
    put_linear("features.embeddings.linear", f["positional"])
    put_linear("features.node_embedding", f["node_embedding"])
    put_norm("features.norm_nodes", f["norm_nodes"])
    put_linear("features.edge_embedding", f["edge_embedding"])
    put_norm("features.norm_edges", f["norm_edges"])
    put_linear("W_v", params["W_v"])
    put_linear("W_e", params["W_e"])
    sd["W_s.weight"] = np.asarray(params["W_s"]["emb"])
    put_linear("W_out", params["W_out"])
    for i, lp in enumerate(params["encoder"]):
        for name in ["W1", "W2", "W3", "W11", "W12", "W13"]:
            put_linear(f"encoder_layers.{i}.{name}", lp[name])
        for name in ["norm1", "norm2", "norm3"]:
            put_norm(f"encoder_layers.{i}.{name}", lp[name])
        put_linear(f"encoder_layers.{i}.dense.W_in", lp["dense"]["W_in"])
        put_linear(f"encoder_layers.{i}.dense.W_out", lp["dense"]["W_out"])
    for i, lp in enumerate(params["decoder"]):
        for name in ["W1", "W2", "W3"]:
            put_linear(f"decoder_layers.{i}.{name}", lp[name])
        for name in ["norm1", "norm2"]:
            put_norm(f"decoder_layers.{i}.{name}", lp[name])
        put_linear(f"decoder_layers.{i}.dense.W_in", lp["dense"]["W_in"])
        put_linear(f"decoder_layers.{i}.dense.W_out", lp["dense"]["W_out"])
    return sd
