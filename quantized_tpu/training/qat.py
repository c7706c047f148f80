"""QAT trainer (reference main.py: epoch loop + shared forward() batch loop).

The reference's single ``forward(data_loader, model, criterion, epoch,
training, optimizer)`` becomes a jitted NNX train/eval step plus a host-side
epoch loop with meters and periodic logging. Distribution: with a mesh, the
step is sharded DP+TP via the parallel rules (replacing the reference's
``nn.DataParallel``).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from quantized_tpu.training.regime import build_optimizer, regime_settings, update_hyperparams
from quantized_tpu.utils.meters import AverageMeter, accuracy

logger = logging.getLogger(__name__)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))


def set_compute_dtype(model: nnx.Module, dtype) -> int:
    """Mixed-precision QAT, TPU-first (no reference counterpart — the 2018
    CUDA path is fp32 throughout): run every conv/GEMM in ``dtype`` (bf16 —
    the MXU's native operand type; f32 accumulation is XLA's default) while
    fake-quant boundary math, observer EMAs, BN statistics, the loss, grads
    and the optimizer stay f32. Besides MXU rate, the saved-for-backward conv
    operands halve, cutting training-step HBM traffic (bench/train_step.py
    measures the win). Returns the number of layers switched.

    bf16 operand rounding blurs each fake-quant decision boundary by ~2^-8
    relative — QAT is robust to this (the STE already treats the boundary as
    noise), but bit-exact reference-semantics tests must keep the default f32.
    """
    from quantized_tpu.models import layers as L

    n = 0
    for _, node in nnx.iter_graph(model):
        if isinstance(node, (L.Conv2d, L.Linear, L.QConv2d, L.QLinear)):
            node.compute_dtype = dtype
            n += 1
    return n


class Trainer:
    """Epoch-driven QAT trainer with the reference's regime semantics."""

    def __init__(
        self,
        model: nnx.Module,
        regime: Optional[Dict[int, Dict[str, Any]]] = None,
        mesh=None,
        print_freq: int = 10,
        compute_dtype=None,
    ):
        self.model = model
        if compute_dtype is not None:
            set_compute_dtype(model, jnp.bfloat16 if compute_dtype in ("bf16", "bfloat16") else compute_dtype)
        self.regime = regime if regime is not None else getattr(model, "regime", None)
        self.mesh = mesh
        self.print_freq = print_freq
        self._settings = regime_settings(self.regime, 0)
        self._tx = build_optimizer(self._settings)
        self._opt = nnx.Optimizer(model, self._tx, wrt=nnx.Param)
        if mesh is not None:
            from quantized_tpu.parallel.sharding import shard_model_state

            nnx.update(model, shard_model_state(nnx.state(model), mesh))

        @nnx.jit
        def _train_step(model, opt, x, y):
            def loss_fn(model):
                logits = model(x)
                return cross_entropy(logits, y), logits

            (loss, logits), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
            opt.update(model, grads)
            return loss, logits

        @nnx.jit
        def _eval_step(model, x, y):
            logits = model(x)
            return cross_entropy(logits, y), logits

        self._train_step = _train_step
        self._eval_step = _eval_step

    def adjust_for_epoch(self, epoch: int):
        """Reference adjust_optimizer: apply regime settings for this epoch.
        Optimizer-class swaps rebuild state; hyperparam changes do not."""
        new = regime_settings(self.regime, epoch)
        if new != self._settings:
            if new["optimizer"] != self._settings["optimizer"]:
                self._tx = build_optimizer(new)
                self._opt = nnx.Optimizer(self.model, self._tx, wrt=nnx.Param)
                logger.info("regime: optimizer -> %s", new["optimizer"])
            else:
                update_hyperparams(self._opt.opt_state, new)
            logger.info("regime epoch %d: %s", epoch, new)
            self._settings = new

    def _shard_batch(self, x, y):
        if self.mesh is None:
            return jnp.asarray(x), jnp.asarray(y)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from quantized_tpu.parallel.mesh import DATA_AXIS

        xs = jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, P(DATA_AXIS, None, None, None)))
        ys = jax.device_put(jnp.asarray(y), NamedSharding(self.mesh, P(DATA_AXIS)))
        return xs, ys

    def run_epoch(
        self, batches: Iterable[Tuple[np.ndarray, np.ndarray]], epoch: int, training: bool
    ) -> Dict[str, float]:
        """The reference's shared ``forward`` loop (main.py ~L215-290)."""
        if training:
            self.model.train()
            self.adjust_for_epoch(epoch)
        else:
            self.model.eval()
        losses, top1, top5 = AverageMeter(), AverageMeter(), AverageMeter()
        batch_time, data_time = AverageMeter(), AverageMeter()
        end = time.time()
        for i, (x, y) in enumerate(batches):
            data_time.update(time.time() - end)
            xs, ys = self._shard_batch(x, y)
            if training:
                loss, logits = self._train_step(self.model, self._opt, xs, ys)
            else:
                loss, logits = self._eval_step(self.model, xs, ys)
            loss = float(loss)
            k = min(5, logits.shape[-1])
            accs = accuracy(logits, y, topk=(1, k))
            n = len(y)
            losses.update(loss, n)
            top1.update(accs[0], n)
            top5.update(accs[-1], n)
            batch_time.update(time.time() - end)
            end = time.time()
            if i % self.print_freq == 0:
                logger.info(
                    "%s epoch %d [%d]: loss %.4f (%.4f) top1 %.2f (%.2f) time %.3fs data %.3fs",
                    "train" if training else "eval",
                    epoch,
                    i,
                    loss,
                    losses.avg,
                    accs[0],
                    top1.avg,
                    batch_time.val,
                    data_time.val,
                )
        return {
            "loss": losses.avg,
            "top1": top1.avg,
            "top5": top5.avg,
            "batch_time": batch_time.avg,
            "data_time": data_time.avg,
        }

    def train_epoch(self, batches, epoch: int):
        return self.run_epoch(batches, epoch, training=True)

    def validate(self, batches, epoch: int = 0):
        return self.run_epoch(batches, epoch, training=False)
