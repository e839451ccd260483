"""CLI entry point: ``python -m piccolo_tpu.main --config <ini> --log <dir>``.

Same public interface as the reference driver (``main.py:10-68``): parse the
ini config, apply ``--override k=v[,k2=v2...]``, persist the effective
config to ``<log>/config.ini``, open a TensorBoard writer, and dispatch on
``cfg.dataset`` to the matching evaluation harness.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="piccolo_tpu: TPU-native omnidirectional camera localization"
    )
    parser.add_argument(
        "--config", type=str, default=None, required=True,
        help="Config ini file to use for running experiments",
    )
    parser.add_argument(
        "--log", type=str, default="./log",
        help="Log directory for results, artifacts, and TensorBoard",
    )
    parser.add_argument(
        "--override", type=str, default=None,
        help="Config overrides, e.g. 'num_iter=50,lr=0.2'",
    )
    parser.add_argument(
        "--no-tensorboard", action="store_true",
        help="Skip TensorBoard event writing",
    )
    return parser


def main(argv=None) -> float:
    from .config import apply_overrides, parse_ini, save_config
    from .harness import localize_omniscenes, localize_stanford

    args = build_parser().parse_args(argv)
    cfg = parse_ini(args.config)
    cfg = apply_overrides(cfg, args.override)

    from .config import cfg_get
    from .utils import enable_compilation_cache

    if cfg_get(cfg, "compilation_cache", True):
        enable_compilation_cache(cfg_get(cfg, "compilation_cache_dir"))

    os.makedirs(args.log, exist_ok=True)
    save_config(cfg, args.log)

    writer = None
    if not args.no_tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(args.log)
        except Exception:
            writer = None

    if cfg.dataset == "Stanford2D-3D-S":
        return localize_stanford(cfg, writer, args.log)
    if cfg.dataset == "OmniScenes":
        return localize_omniscenes(cfg, writer, args.log)
    raise ValueError(f"unknown dataset: {cfg.dataset!r}")


if __name__ == "__main__":
    main()
