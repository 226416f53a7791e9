"""Shared CLI plumbing."""

from __future__ import annotations

import argparse


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset", type=str, default="synth-cora")
    p.add_argument("--data-root", type=str, default="./data")
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--n-epochs", type=int, default=200)
    p.add_argument("--n-hidden", type=int, default=16)
    p.add_argument("--n-layers", type=int, default=1)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--rnd-seed", type=int, default=3)
    p.add_argument("--use-layernorm", type=str, default="True",
                   choices=["True", "False"])
    p.add_argument("--result-json", type=str, default=None,
                   help="write the result dict to this path as JSON")
    p.add_argument("--spmm-backend", type=str, default="auto",
                   choices=["auto", "segment", "pallas"],
                   help="aggregation kernel; auto = pallas on TPU "
                        "hardware when the graph carries tiles, else "
                        "the XLA segment path")
    p.add_argument("--cpu-mesh", type=int, default=0,
                   help="run on a virtual N-device CPU mesh (the "
                        "reference's N-processes-one-GPU analog): "
                        "multi-subnet configs need num_subnet devices, "
                        "which one real chip can't provide.  Must be "
                        "the FIRST thing applied — call apply_backend "
                        "before any jax device query.")


def apply_backend(args) -> None:
    if getattr(args, "cpu_mesh", 0):
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    from gist_tpu.ops.spmm import set_default_backend
    set_default_backend(args.spmm_backend)


def str2bool(v: str) -> bool:
    # the reference passes booleans as 'True'/'False' strings
    # (train_ist.py:42-59); accept those plus argparse-native spellings
    return str(v).lower() in ("true", "1", "yes")
