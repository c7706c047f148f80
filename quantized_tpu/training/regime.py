"""Optimizer-regime engine (reference ``adjust_optimizer``, utils.py
~L155-185).

The reference walks every regime entry with epoch <= current and applies its
settings cumulatively (lr / momentum / weight_decay, and can swap the
optimizer class by name). Here the merged settings feed an optax chain built
via ``inject_hyperparams`` so lr/weight-decay changes do NOT reset momentum
state; only an optimizer-class swap rebuilds state (matching torch, where
``torch.optim.__dict__[name]`` swap also discards state).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import optax

DEFAULT_SETTINGS = {"optimizer": "SGD", "lr": 0.1, "momentum": 0.0, "weight_decay": 0.0}


def regime_settings(regime: Optional[Dict[int, Dict[str, Any]]], epoch: int) -> Dict[str, Any]:
    """Merged settings at ``epoch`` (cumulative walk, reference semantics).
    Callable regimes (reference: regime may be a function) are invoked."""
    merged = dict(DEFAULT_SETTINGS)
    if regime is None:
        return merged
    if callable(regime):
        regime = regime(epoch)
    for e in sorted(k for k in regime if k <= epoch):
        merged.update(regime[e])
    return merged


def _make(optimizer: str, lr: float, momentum: float, weight_decay: float):
    # NOTE: called inside optax.inject_hyperparams — lr/momentum/weight_decay
    # may be traced arrays, so no Python control flow on their values.
    opt = optimizer.lower()
    if opt == "sgd":
        core = optax.sgd(lr, momentum=momentum)
    elif opt == "adam":
        core = optax.adam(lr)
    elif opt == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay)
    elif opt == "rmsprop":
        core = optax.rmsprop(lr, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    # weight_decay=0 is the identity; always chain so a regime change to a
    # nonzero value needs no optimizer rebuild.
    return optax.chain(optax.add_decayed_weights(weight_decay), core)


def build_optimizer(settings: Dict[str, Any]) -> optax.GradientTransformation:
    """optax chain with injected lr/momentum/weight_decay hyperparams."""
    return optax.inject_hyperparams(
        lambda lr, momentum, weight_decay: _make(settings["optimizer"], lr, momentum, weight_decay)
    )(
        lr=float(settings.get("lr", 0.1)),
        momentum=float(settings.get("momentum", 0.0) or 0.0),
        weight_decay=float(settings.get("weight_decay", 0.0) or 0.0),
    )


def update_hyperparams(opt_state, settings: Dict[str, Any]):
    """Adjust injected hyperparams in place (no state reset)."""
    hp = opt_state.hyperparams
    hp["lr"] = type(hp["lr"])(float(settings.get("lr", 0.1)))
    hp["momentum"] = type(hp["momentum"])(float(settings.get("momentum", 0.0) or 0.0))
    hp["weight_decay"] = type(hp["weight_decay"])(float(settings.get("weight_decay", 0.0) or 0.0))
    return opt_state
