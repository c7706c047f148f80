"""Load reference PyTorch checkpoints into NNX model state.

Layout translation (reference -> this framework):
- conv weights: OIHW -> HWIO transpose, key ``<m>.weight`` -> ``<m>.kernel``
- linear weights: (out, in) kept, key ``weight`` stays ``weight``
- BatchNorm: ``weight/bias/running_mean/running_var`` ->
  nnx.BatchNorm ``scale/bias/mean/var``
- RangeBN: ``weight/bias/running_mean/running_var`` keep their names
  (our RangeBN module mirrors the reference buffer layout)
- observers: ``quantize_input.running_min/.running_max`` keep their names
- downsample: reference ``downsample.0``/``downsample.1`` (Sequential) ->
  ``downsample.conv``/``downsample.bn``

torch is used CPU-only and only here (SURVEY.md section 4: torch 2.13+cpu is
the checkpoint-ingestion oracle; the compute path never imports it).
"""

from __future__ import annotations

import io
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference ``checkpoint.pth.tar``; returns the full dict
    (``state_dict`` + metadata). Accepts a bare state_dict too."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, Mapping) and "state_dict" in ckpt:
        meta = {k: v for k, v in ckpt.items() if k != "state_dict"}
        state_dict = ckpt["state_dict"]
    else:
        meta = {}
        state_dict = ckpt
    out = {}
    for k, v in state_dict.items():
        # DataParallel prefixes 'module.'; strip for parity with single-GPU saves
        k = k[len("module.") :] if k.startswith("module.") else k
        out[k] = np.asarray(v.detach().cpu().numpy())
    return {"state_dict": out, "meta": meta}


def _is_conv_weight(key: str, arr: np.ndarray) -> bool:
    return key.endswith(".weight") and arr.ndim == 4


_BN_KEY_MAP = {  # torch BatchNorm -> nnx.BatchNorm
    "weight": "scale",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def state_dict_to_nnx(
    state_dict: Mapping[str, np.ndarray],
    model: nnx.Module,
) -> Dict[Tuple, np.ndarray]:
    """Translate reference keys/layouts into a flat {nnx path: array} dict.

    The model is inspected to decide whether a BN-ish key belongs to an
    nnx.BatchNorm (rename + no transpose) or our RangeBN (names kept).
    """
    flat = dict(nnx.to_flat_state(nnx.state(model)))
    available = {tuple(str(p) for p in k): k for k in flat}

    def module_path(parts):
        return tuple(parts)

    # NCHW-flatten boundary (AlexNet fc1): the reference flattens conv maps
    # as (C,H,W), this zoo flattens NHWC — permute those weight columns
    flatten_name, flatten_chw = getattr(model, "flatten_linear", (None, None))

    out: Dict[Tuple, np.ndarray] = {}
    for key, arr in state_dict.items():
        if key.endswith("num_batches_tracked"):
            # torch BN bookkeeping with no JAX counterpart — every
            # torch-authored checkpoint carries one per BN module
            continue
        parts = key.split(".")
        # downsample Sequential indices -> named children
        parts = ["conv" if (p == "0" and parts[i - 1] == "downsample") else p for i, p in enumerate(parts)]
        parts = ["bn" if (p == "1" and parts[i - 1] == "downsample") else p for i, p in enumerate(parts)]
        leaf = parts[-1]
        prefix = parts[:-1]
        if (
            leaf == "weight" and arr.ndim == 2 and prefix
            and prefix[-1] == flatten_name
            and arr.shape[1] == int(np.prod(flatten_chw))
        ):
            c, h, w = flatten_chw
            arr = arr.reshape(arr.shape[0], c, h, w).transpose(0, 2, 3, 1).reshape(arr.shape[0], -1)

        candidates = []
        if arr.ndim == 4 and leaf == "weight":
            candidates.append((prefix + ["kernel"], arr.transpose(2, 3, 1, 0)))
        if leaf in _BN_KEY_MAP:
            candidates.append((prefix + [_BN_KEY_MAP[leaf]], arr))
        candidates.append((parts, arr))  # identity (RangeBN, observers, linear)

        placed = False
        for cand_parts, cand_arr in candidates:
            cand = tuple(str(p) for p in cand_parts)
            if cand in available:
                out[available[cand]] = cand_arr
                placed = True
                break
        if not placed:
            raise KeyError(
                f"checkpoint key {key!r} has no home in the model "
                f"(tried {[c[0] for c in candidates]})"
            )
    return out


def load_into_model(model: nnx.Module, path_or_state: Any, strict: bool = True) -> nnx.Module:
    """Load a reference checkpoint (path or pre-loaded state_dict) into an NNX
    model in place. ``strict`` additionally requires every model param/stat to
    be covered by the checkpoint."""
    if isinstance(path_or_state, (str, os.PathLike)):
        state_dict = load_reference_checkpoint(str(path_or_state))["state_dict"]
    else:
        state_dict = path_or_state
    mapped = state_dict_to_nnx(state_dict, model)

    flat = dict(nnx.to_flat_state(nnx.state(model)))
    covered = set(mapped)
    for k, var in flat.items():
        if k in covered:
            want = var.get_value()
            got = mapped[k]
            if tuple(np.shape(want)) != tuple(np.shape(got)):
                raise ValueError(f"shape mismatch at {k}: model {np.shape(want)} ckpt {np.shape(got)}")
            var.set_value(jnp.asarray(got, dtype=jnp.asarray(want).dtype))
        elif strict and isinstance(var, nnx.variablelib.VariableState if hasattr(nnx, "variablelib") else object):
            # RngStream counters and dropout keys are framework-internal; skip
            path_str = "/".join(str(p) for p in k)
            if "rng" in path_str.lower() or "dropout" in path_str.lower():
                continue
            raise KeyError(f"model variable {k} not covered by checkpoint")
    nnx.update(model, nnx.from_flat_state(flat))
    return model
