"""CLI / experiment driver (reference ``main.py``, SURVEY.md #20).

Flag surface mirrors the reference (--results_dir --save --dataset --model
--model_config --input_size --type --workers -b --epochs --start-epoch
--optimizer --lr --momentum --weight-decay --print-freq --resume
--evaluate/-e) and adds the engine's new capabilities:
--calibrate (run calibration batches through frozen models),
--convert-int / --weight-bits / --backend (true-integer execution),
--serve (continuous-batching server), --mesh-model-parallel (TP degree),
--export-reference (write a torch-format .pth.tar).

``--type`` maps the reference's tensor-type string (device+dtype selector,
default torch.cuda.FloatTensor) onto JAX platforms/dtypes:
``tpu.float`` (default), ``cpu.float``, ``tpu.bf16``.
"""

from __future__ import annotations

import argparse
import ast
import logging
import os
import sys
import time
from datetime import datetime


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="quantized_tpu training/eval/serving driver")
    # --- reference-parity flags (main.py ~L20-75) ---
    p.add_argument("--results_dir", default="./results", help="results dir")
    p.add_argument("--save", default="", help="saved folder name (default: timestamp)")
    p.add_argument("--dataset", default="imagenet", help="dataset name or 'synthetic'")
    p.add_argument("--model", default="alexnet", help="model factory name")
    p.add_argument("--model_config", default="", help="dict literal with model config, e.g. \"{'depth': 18}\"")
    p.add_argument("--input_size", type=int, default=None)
    p.add_argument("--type", default="tpu.float", help="device.dtype selector (ref: torch.cuda.FloatTensor)")
    p.add_argument("--gpus", default=None, help="accepted for reference-CLI parity; mesh flags control devices")
    p.add_argument("-j", "--workers", type=int, default=0, help="data loading workers (numpy batching)")
    p.add_argument("-b", "--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("--optimizer", default="SGD")
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--resume", default="", help="native checkpoint dir or reference .pth.tar")
    p.add_argument("--save_all", action="store_true", help="keep a per-epoch checkpoint copy (reference utils.py save_checkpoint save_all)")
    p.add_argument("--sync-checkpoints", action="store_true", help="block on each checkpoint write instead of the default async (Orbax background) saves")
    p.add_argument("-e", "--evaluate", action="store_true")
    # --- engine extensions ---
    p.add_argument("--calibrate", type=int, default=0, metavar="N", help="run N calibration batches (observers update, no grads)")
    p.add_argument("--convert-int", action="store_true", help="convert to true-integer execution before eval/serve")
    p.add_argument("--weight-bits", type=int, default=8, choices=[4, 8])
    p.add_argument("--backend", default="xla", choices=["xla", "gemm", "pallas", "bf16"], help="int conv backend")
    p.add_argument("--weight-quant", default="per_channel", choices=["per_channel", "per_tensor"],
                   help="per_channel: production grid (symmetric, BN folded); per_tensor: "
                        "strict-parity mode — the reference's own affine weight grid, BN unfolded "
                        "(exact twin of fake-quant eval)")
    p.add_argument("--resident", action="store_true", help="int8-resident engine (activations stay int8 across the net; ResNet and AlexNet geometries)")
    p.add_argument("--autotune", action="store_true", help="per-layer backend autotune on the live device (resident engine)")
    p.add_argument("--serve", action="store_true", help="start the continuous-batching server")
    p.add_argument("--serve-steps", type=int, default=0, help="serve for N scheduler steps then exit (0=forever)")
    p.add_argument("--serve-u8", action="store_true", help="serve raw uint8 images (normalize+quantize fused into the engine ingest)")
    p.add_argument("--serve-http", type=int, default=0, metavar="PORT",
                   help="expose the server over HTTP on PORT (/predict raw-bytes POST with "
                        "X-Shape/X-Dtype headers, /stats JSON; 0 = no endpoint)")
    p.add_argument("--serve-timeout", type=float, default=0.0, metavar="SECS",
                   help="serving SLA: fail requests still queued after SECS with TimeoutError "
                        "(0 = no deadline); in-flight batches always complete")
    p.add_argument("--serve-pipeline", type=int, default=1, metavar="DEPTH",
                   help="batches kept in flight by the scheduler (1 = lowest latency; "
                        "4 measured ~3x throughput at device capacity — bench/serving_capacity.py)")
    p.add_argument("--mesh-model-parallel", type=int, default=None, help="TP degree over the model axis")
    p.add_argument("--tp-explicit", action="store_true",
                   help="route the classifier head AND every conv of the last "
                        "stage through the explicit shard_map TP forms (int8 "
                        "all-gather convs, int32 psum-scatter fc) instead of "
                        "GSPMD (requires --mesh-model-parallel)")
    p.add_argument("--export-reference", default="", help="export weights to a reference-format .pth.tar and exit")
    p.add_argument("--compute-dtype", default="f32", choices=["f32", "bf16"],
                   help="training matmul/conv operand dtype: bf16 runs every conv/GEMM on the MXU's "
                        "native operand type (fake-quant boundaries, observers, BN stats and SGD stay "
                        "f32) — +21%% QAT step throughput on ResNet-50 (bench/train_step.py)")
    p.add_argument("--prng", default="threefry", choices=["threefry", "rbg", "unsafe_rbg"],
                   help="PRNG implementation for stochastic gradient rounding: rbg uses the TPU's "
                        "hardware rng-bit-generator — +13%% flagship grad-quant train step vs the "
                        "threefry default (bench/train_step.py, 667->757 img/s); threefry keeps the "
                        "default partitionable/reproducible stream semantics")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--profile", default="", metavar="DIR", help="write an XProf/TensorBoard trace of the eval to DIR")
    p.add_argument("--debug-nans", action="store_true", help="jax_debug_nans: re-run any op producing NaN un-jitted and raise with its location (SURVEY.md section 5 sanitizer mode)")
    p.add_argument("--deterministic", action="store_true", help="bit-reproducible runs: XLA deterministic ops, partitionable threefry PRNG, and single-threaded data loading")
    return p


def _apply_type(type_str: str):
    import jax

    if type_str.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    return "bfloat16" if type_str.endswith("bf16") else "float32"


def main(argv=None):
    args = build_parser().parse_args(argv)
    dtype = _apply_type(args.type)

    import jax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
        # also arm the s16 residual-leg saturation counter (ops/int8_conv)
        os.environ["QTPU_DEBUG_S16"] = "1"
    if args.deterministic:
        # TPU XLA kernels are deterministic for this op set; reproducibility
        # hinges on (a) a sharding-invariant PRNG and (b) host-side batch
        # order, which multi-worker loading would make race-dependent.
        jax.config.update("jax_threefry_partitionable", True)
        args.workers = 0
        args.prng = "threefry"  # rbg streams are not partition-invariant
    if args.prng != "threefry":
        # must precede model construction: the RngStream keys' impl is fixed
        # at key creation (nnx.Rngs below)
        jax.config.update("jax_default_prng_impl", args.prng)
    import numpy as np
    from flax import nnx

    from quantized_tpu.data import get_dataset, get_transform
    from quantized_tpu.models import get_model
    from quantized_tpu.training import Trainer
    from quantized_tpu.utils import ResultsLog, save_checkpoint, setup_logging
    from quantized_tpu.utils.checkpoint import export_reference_checkpoint, load_checkpoint
    from quantized_tpu.engine.executor import enable_compilation_cache

    enable_compilation_cache()
    save_name = args.save or datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    save_path = os.path.join(args.results_dir, save_name)
    os.makedirs(save_path, exist_ok=True)
    setup_logging(os.path.join(save_path, "log.txt"))
    logger = logging.getLogger("main")
    logger.info("args: %s", vars(args))
    logger.info("devices: %s", jax.devices())

    model_config = {"dataset": args.dataset} if args.dataset != "synthetic" else {"dataset": "cifar10"}
    if args.model_config:
        model_config.update(ast.literal_eval(args.model_config))
    if args.model in ("alexnet", "alexnet_quantized", "mnist", "mobilenet", "mobilenet_quantized"):
        model_config.pop("dataset", None)
    from quantized_tpu.utils.hostbuild import host_build, put_model

    # construct on the host CPU backend: weight init + checkpoint restore
    # never cross the accelerator boundary (arrays stay uncommitted, so the
    # first jitted step ships them in one batch) — measured 42 s -> ~2 s of
    # ResNet-50 cold-start load in the tunneled sandbox (bench/coldstart.py),
    # and the right shape for real pods (construct on host, ship once)
    with host_build():
        model = get_model(args.model)(rngs=nnx.Rngs(args.seed), **model_config)
    logger.info("created model %s with config %s", args.model, model_config)

    regime = getattr(model, "regime", None)
    if args.lr != 0.1 or args.optimizer != "SGD":
        regime = {
            0: {
                "optimizer": args.optimizer,
                "lr": args.lr,
                "momentum": args.momentum,
                "weight_decay": args.weight_decay,
            }
        }

    if args.resume:
        if args.resume.endswith(".pth.tar") or args.resume.endswith(".pt"):
            from quantized_tpu.ingest import load_into_model

            load_into_model(model, args.resume)
            logger.info("ingested reference checkpoint %s", args.resume)
        else:
            meta = load_checkpoint(model, args.resume)
            args.start_epoch = int(meta.get("epoch", args.start_epoch))
            logger.info("resumed %s at epoch %d", args.resume, args.start_epoch)

    if args.export_reference:
        export_reference_checkpoint(model, args.export_reference, {"model": args.model, "config": model_config})
        logger.info("exported reference checkpoint to %s", args.export_reference)
        return 0

    transform_name = getattr(model, "input_transform", args.dataset)
    if args.dataset in ("cifar10", "cifar100", "mnist", "synthetic"):
        transform_name = "cifar10" if args.dataset == "synthetic" else args.dataset
    val_tf = get_transform(transform_name, args.input_size, augment=False)
    val_data = get_dataset(args.dataset, "val", val_tf)
    if val_data.synthetic:
        logger.warning("dataset %s not found locally -> synthetic stand-in", args.dataset)

    mesh = None
    if args.mesh_model_parallel:
        from quantized_tpu.parallel import create_mesh

        mesh = create_mesh(model_parallel=args.mesh_model_parallel)
        logger.info("mesh: %s", dict(mesh.shape))

    trainer = Trainer(
        model,
        regime=regime,
        mesh=mesh,
        print_freq=args.print_freq,
        compute_dtype=None if args.compute_dtype == "f32" else args.compute_dtype,
    )

    if args.calibrate:
        model.train()
        calib = nnx.jit(lambda m, v: m(v))
        for i, (x, _) in enumerate(val_data.batches(args.batch_size)):
            if i >= args.calibrate:
                break
            calib(model, jax.numpy.asarray(x))
        model.eval()
        logger.info("calibrated observers on %d batches", args.calibrate)

    if args.convert_int:
        if args.resident:
            from quantized_tpu.engine import (
                build_int8_alexnet,
                build_int8_mobilenet,
                build_int8_resident,
            )

            # convert host-side (weights may still be CPU-resident from the
            # host_build construction; deriving scales/epilogues reads every
            # weight, which through a tunnel is the cold-start bottleneck)
            with host_build():
                if "alexnet" in args.model:
                    model = build_int8_alexnet(model, weight_bits=args.weight_bits, backend=args.backend)
                elif "mobilenet" in args.model:
                    model = build_int8_mobilenet(model, weight_bits=args.weight_bits, backend=args.backend)
                else:
                    model = build_int8_resident(model, weight_bits=args.weight_bits, backend=args.backend)
            if mesh is None:
                put_model(model)  # one batched H2D push of the finished engine
            # with a mesh, leave arrays uncommitted: the TP/GSPMD sharding
            # below places them per-spec (a committed single-device push
            # would conflict with the mesh placement)
            trainer.model = model
            if args.autotune:
                import jax.numpy as jnp

                from quantized_tpu.engine import apply_cached_backends, autotune_resident

                size = args.input_size or (32 if "cifar" in args.dataset else 224)
                example = jnp.zeros((args.batch_size, size, size, 3), jnp.float32)
                if not apply_cached_backends(model, example):
                    autotune_resident(model, example)
            logger.info("converted to int%d-resident engine (backend=%s)", args.weight_bits, args.backend)
        else:
            from quantized_tpu.engine import convert_to_int

            with host_build():
                convert_to_int(model, weight_bits=args.weight_bits, backend=args.backend,
                               weight_quant=args.weight_quant)
            if mesh is None:
                put_model(model)
            logger.info("converted to int%d execution (backend=%s, weight_quant=%s)",
                        args.weight_bits, args.backend, args.weight_quant)
        if args.tp_explicit:
            if mesh is None:
                raise SystemExit("--tp-explicit requires --mesh-model-parallel")
            from quantized_tpu.parallel.tp_engine import apply_explicit_tp

            n = apply_explicit_tp(model, mesh)
            logger.info(
                "explicit TP wired: fc reduce-scatter head + %d last-stage"
                " all-gather convs", n,
            )

    if args.serve:
        from quantized_tpu.engine.server import serve

        return serve(model, mesh=mesh, batch_sizes=(1, 8, 32, args.batch_size),
                     max_steps=args.serve_steps,
                     ingest="u8" if args.serve_u8 else "f32",
                     pipeline_depth=args.serve_pipeline,
                     http_port=args.serve_http or None,
                     request_timeout_s=args.serve_timeout or None)

    if args.evaluate:
        if args.profile:
            from quantized_tpu.utils.profiling import trace

            with trace(args.profile):
                metrics = trainer.validate(val_data.batches(args.batch_size), 0)
            logger.info("profile trace written to %s", args.profile)
            print({"top1": metrics["top1"], "top5": metrics["top5"], "loss": metrics["loss"]})
            return 0
        metrics = trainer.validate(val_data.batches(args.batch_size), 0)
        logger.info("EVAL: loss %.4f top1 %.2f%% top5 %.2f%%", metrics["loss"], metrics["top1"], metrics["top5"])
        print({"top1": metrics["top1"], "top5": metrics["top5"], "loss": metrics["loss"]})
        return 0

    # training loop (reference main(): epoch loop with checkpoint + ResultsLog)
    train_tf = get_transform(transform_name, args.input_size, augment=True)
    train_data = get_dataset(args.dataset, "train", train_tf)
    results = ResultsLog(os.path.join(save_path, "results.csv"))
    results.plot("epoch", ["train_loss", "val_loss"], title="loss")
    results.plot("epoch", ["train_top1", "val_top1"], title="top-1", ylabel="%")
    best_prec1 = 0.0
    for epoch in range(args.start_epoch, args.epochs):
        t = trainer.train_epoch(
            train_data.batches(args.batch_size, shuffle=True, seed=epoch, drop_remainder=True), epoch
        )
        v = trainer.validate(val_data.batches(args.batch_size), epoch)
        is_best = v["top1"] > best_prec1
        best_prec1 = max(best_prec1, v["top1"])
        save_checkpoint(
            model,
            save_path,
            meta={
                "epoch": epoch + 1,
                "model": args.model,
                "config": model_config,
                "best_prec1": best_prec1,
                "regime": {str(k): v2 for k, v2 in (regime or {}).items()},
            },
            is_best=is_best,
            save_all=args.save_all,
            async_save=not args.sync_checkpoints,
        )
        results.add(
            epoch=epoch,
            train_loss=t["loss"],
            val_loss=v["loss"],
            train_top1=t["top1"],
            val_top1=v["top1"],
            train_top5=t["top5"],
            val_top5=v["top5"],
        )
        results.save()
        logger.info(
            "epoch %d: train top1 %.2f val top1 %.2f (best %.2f)", epoch, t["top1"], v["top1"], best_prec1
        )
    from quantized_tpu.utils.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # drain the last async save before exit
    return 0


if __name__ == "__main__":
    sys.exit(main())
