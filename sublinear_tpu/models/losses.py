"""Loss registry for temporal-net training.

Reference: /root/reference/neural-network-implementation/src/training/losses.rs
(LossFunction trait, MseLoss with optional smoothness penalty,
SmoothnessPenalty).  The reference hand-writes loss gradients; here losses are
plain jnp expressions and gradients come from jax.grad, so any registered loss
is training-ready with no extra code.

Every loss has signature (pred, target) -> scalar with pred/target shaped
(..., H); the smoothness penalty (magnitude/"velocity" penalty on the
prediction, losses.rs MseLoss::compute_loss) is a wrapper usable with any
base loss.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..errors import InvalidParametersError


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mae(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def huber(pred, target, delta: float = 1.0):
    err = pred - target
    a = jnp.abs(err)
    quad = 0.5 * err**2
    lin = delta * (a - 0.5 * delta)
    return jnp.mean(jnp.where(a <= delta, quad, lin))


def smoothness_penalty(pred, weight: float):
    """losses.rs SmoothnessPenalty: penalize large prediction magnitudes."""
    return weight * jnp.mean(pred**2)


LOSSES = {"mse": mse, "mae": mae, "huber": huber}


def get_loss(name: str, smoothness_weight: float = 0.0, **kwargs):
    """Resolve a loss by registry name, optionally adding the smoothness
    penalty; extra kwargs are bound (e.g. huber delta)."""
    if name not in LOSSES:
        raise InvalidParametersError(
            f"unknown loss '{name}'", {"allowed": sorted(LOSSES)})
    base = LOSSES[name]

    def loss(pred, target):
        val = base(pred, target, **kwargs) if kwargs else base(pred, target)
        if smoothness_weight > 0.0:
            val = val + smoothness_penalty(pred, smoothness_weight)
        return val

    return loss
