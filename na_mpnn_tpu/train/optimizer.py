"""Noam-warmup Adam optimizer in optax.

lr(step) = factor * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5),
Adam(0.9, 0.98, eps=1e-9) — reference na_model_utils.py:648-686. Adds global
gradient-norm clipping (reference na_run.py:234-235).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, factor: float = 2.0, warmup: int = 4000):
    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32), 1.0)
        return factor * (d_model ** -0.5) * jnp.minimum(
            step ** -0.5, step * (warmup ** -1.5))
    return schedule


def make_optimizer(d_model: int = 128, factor: float = 2.0, warmup: int = 4000,
                   grad_clip_norm: float = 1.0):
    chain = []
    if grad_clip_norm and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9))
    chain.append(optax.scale_by_learning_rate(noam_schedule(d_model, factor, warmup)))
    return optax.chain(*chain)
