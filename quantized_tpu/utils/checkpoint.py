"""Checkpointing (reference utils.py save_checkpoint ~L95-115, SURVEY.md #17).

Two formats:
- **Native**: Orbax checkpoint of the NNX state (+ JSON metadata: epoch,
  model name, config, regime, best_prec1 — the reference's exact metadata
  tuple) with ``checkpoint`` / ``model_best`` naming parity and optional
  per-epoch copies (``save_all``).
- **Reference export**: ``export_reference_checkpoint`` writes a
  torch-loadable ``.pth.tar`` with the reference's key names/layouts (OIHW,
  Sequential downsample indices) so checkpoints flow BOTH ways between the
  frameworks.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import nnx


def _flat_numpy_state(model: nnx.Module) -> Dict[str, np.ndarray]:
    out = {}
    for path, var in nnx.to_flat_state(nnx.state(model)):
        key = "/".join(str(p) for p in path)
        if "rng" in key.lower():
            continue
        out[key] = np.asarray(var.get_value())
    return out


# In-flight async saves: (AsyncCheckpointer, post-save callable) pairs.
_PENDING: list = []


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save is durable and its post-save
    copies (``model_best`` / per-epoch) have run. Call at end of training
    (the epoch loop itself pipelines one save deep — see save_checkpoint)."""
    global _PENDING
    pending, _PENDING = _PENDING, []
    for ckptr, post in pending:
        ckptr.wait_until_finished()
        post()
        ckptr.close()


def save_checkpoint(
    model: nnx.Module,
    path: str,
    meta: Optional[Dict[str, Any]] = None,
    is_best: bool = False,
    filename: str = "checkpoint",
    save_all: bool = False,
    async_save: bool = False,
) -> str:
    """Save model + metadata under ``path/filename``; copy to ``model_best``
    on best; optional per-epoch copy (reference semantics, SURVEY.md #17).

    ``async_save=True`` uses Orbax's AsyncCheckpointer (SURVEY.md section 5
    checkpoint row): the device->host copy happens here, the disk write in a
    background thread. The pipeline is one save deep — the next
    save_checkpoint (or wait_for_checkpoints) drains the previous one, so an
    epoch's write overlaps the next epoch's compute."""
    os.makedirs(path, exist_ok=True)
    target = os.path.join(path, filename)
    flat = _flat_numpy_state(model)
    wait_for_checkpoints()
    with open(target + ".meta.json", "w") as f:
        json.dump({k: _jsonable(v) for k, v in (meta or {}).items()}, f)

    def _post(saved: str) -> None:
        if is_best:
            _copy_ckpt(saved, target, os.path.join(path, "model_best"))
        if save_all and meta and "epoch" in meta:
            _copy_ckpt(saved, target, os.path.join(path, f"checkpoint_epoch_{meta['epoch']}"))

    try:
        import orbax.checkpoint as ocp

        ckpt_dir = os.path.abspath(target + ".orbax")
        if os.path.exists(ckpt_dir):
            shutil.rmtree(ckpt_dir)
        if async_save:
            ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            ckptr.save(ckpt_dir, flat)
            _PENDING.append((ckptr, lambda: _post(ckpt_dir)))
            return ckpt_dir
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(ckpt_dir, flat)
        saved = ckpt_dir
    except Exception:
        np.savez(target + ".npz", **flat)
        saved = target + ".npz"
    _post(saved)
    return saved


def _copy_ckpt(saved: str, target_base: str, dest_base: str):
    if saved.endswith(".orbax"):
        dest = dest_base + ".orbax"
        if os.path.exists(dest):
            shutil.rmtree(dest)
        shutil.copytree(saved, dest)
    else:
        shutil.copyfile(saved, dest_base + ".npz")
    if os.path.exists(target_base + ".meta.json"):
        shutil.copyfile(target_base + ".meta.json", dest_base + ".meta.json")


def load_checkpoint(model: nnx.Module, path: str, filename: str = "checkpoint") -> Dict[str, Any]:
    """Restore model in place; returns metadata (reference --resume path)."""
    target = os.path.join(path, filename) if os.path.isdir(path) else path
    flat_model = dict(nnx.to_flat_state(nnx.state(model)))
    if os.path.exists(target + ".orbax"):
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            flat = ckptr.restore(os.path.abspath(target + ".orbax"))
    elif os.path.exists(target + ".npz"):
        flat = dict(np.load(target + ".npz"))
    else:
        raise FileNotFoundError(f"no checkpoint at {target}(.orbax|.npz)")
    for k, var in flat_model.items():
        key = "/".join(str(p) for p in k)
        if key in flat:
            var.set_value(jax.numpy.asarray(flat[key]))
    nnx.update(model, nnx.from_flat_state(flat_model))
    meta = {}
    if os.path.exists(target + ".meta.json"):
        with open(target + ".meta.json") as f:
            meta = json.load(f)
    return meta


def export_reference_checkpoint(model: nnx.Module, path: str, meta: Optional[Dict[str, Any]] = None):
    """Write a reference-format torch ``.pth.tar`` (inverse of
    ``ingest.load_into_model``): NCHW/OIHW layouts, torch BN names,
    Sequential downsample indices, DataParallel-free keys."""
    import torch

    flat = nnx.to_flat_state(nnx.state(model))
    # inverse of ingest's NCHW-flatten permutation (AlexNet fc1 — see
    # torch_loader.state_dict_to_nnx)
    flatten_name, flatten_chw = getattr(model, "flatten_linear", (None, None))
    state_dict = {}
    for p, var in flat:
        parts = [str(x) for x in p]
        key = ".".join(parts)
        if "rng" in key.lower() or "dropout" in key.lower():
            continue
        val = np.asarray(var.get_value())
        leaf = parts[-1]
        prefix = parts[:-1]
        prefix = ["0" if (x == "conv" and i > 0 and prefix[i - 1] == "downsample") else x for i, x in enumerate(prefix)]
        prefix = ["1" if (x == "bn" and i > 0 and prefix[i - 1] == "downsample") else x for i, x in enumerate(prefix)]
        if (
            leaf == "weight" and val.ndim == 2 and prefix
            and prefix[-1] == flatten_name
            and val.shape[1] == int(np.prod(flatten_chw))
        ):
            c, h, w = flatten_chw
            val = val.reshape(val.shape[0], h, w, c).transpose(0, 3, 1, 2).reshape(val.shape[0], -1)
        if leaf == "kernel":
            state_dict[".".join(prefix + ["weight"])] = torch.from_numpy(val.transpose(3, 2, 0, 1).copy())
        elif leaf in ("scale", "mean", "var") and val.ndim == 1:
            name = {"scale": "weight", "mean": "running_mean", "var": "running_var"}[leaf]
            state_dict[".".join(prefix + [name])] = torch.from_numpy(val.copy())
        else:
            state_dict[".".join(prefix + [leaf])] = torch.from_numpy(val.copy())
    payload = dict(meta or {})
    payload["state_dict"] = state_dict
    torch.save(payload, path)
    return path


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return float(v) if hasattr(v, "__float__") else str(v)
