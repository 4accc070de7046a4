"""Command-line interface (SURVEY.md C20): ``train``, ``stabilize``,
``bench`` and ``eval`` subcommands — the reference's train/test argparse
scripts rebuilt as one typed CLI over the config dataclasses.

    python -m pwstablenet_tpu.cli stabilize --input shaky.avi --output out.mp4
    python -m pwstablenet_tpu.cli train --data-root DeepStab --steps 10000
    python -m pwstablenet_tpu.cli bench
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--temporal-window", type=int, default=None)
    p.add_argument("--num-stages", type=int, default=None)
    p.add_argument("--num-levels", type=int, default=None)
    p.add_argument("--base-features", type=int, default=None)
    p.add_argument("--max-features", type=int, default=None)
    p.add_argument("--norm", choices=["batch", "instance", "group", "none"],
                   default=None)
    p.add_argument("--interstage", choices=["features", "warped", "both"],
                   default=None)
    p.add_argument("--model-height", type=int, default=None)
    p.add_argument("--model-width", type=int, default=None)


def _model_cfg(args):
    from pwstablenet_tpu.config import ModelConfig

    cfg = ModelConfig()
    over = {}
    for field in (
        "temporal_window", "num_stages", "num_levels", "base_features",
        "max_features", "norm", "interstage",
    ):
        v = getattr(args, field, None)
        if v is not None:
            over[field] = v
    if args.model_height or args.model_width:
        h = args.model_height or cfg.model_resolution[0]
        w = args.model_width or cfg.model_resolution[1]
        over["model_resolution"] = (h, w)
    return dataclasses.replace(cfg, **over)


def cmd_stabilize(args) -> int:
    import numpy as np

    from pwstablenet_tpu.config import PipelineConfig
    from pwstablenet_tpu.pipeline import Stabilizer

    model_cfg = _model_cfg(args)
    pipe_cfg = PipelineConfig(
        batch_windows=args.batch_windows,
        border_crop_frac=args.border_crop,
        emit_warp_fields=args.warp_fields is not None,
        warp_field_dtype=args.warp_dtype,
    )
    params = None
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pt")):
            # migrated reference checkpoint (interop weight-layout rules)
            from pwstablenet_tpu.interop import load_torch_checkpoint

            params = load_torch_checkpoint(args.checkpoint, model_cfg)
        else:
            from pwstablenet_tpu.train import checkpoint as ckpt

            params = ckpt.load_params(args.checkpoint)
    stab = Stabilizer(model_cfg, pipe_cfg, params=params)

    if args.synthetic:
        from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
        from pwstablenet_tpu.data import video_io

        _, unstable = synthetic_pair_clip(
            args.frames, args.height, args.width, seed=0
        )
        out, flows = stab.stabilize_frames(unstable)
        if args.output:
            video_io.write_video(args.output, out, 30.0)
        if args.warp_fields:
            np.savez_compressed(args.warp_fields, warp_fields=flows)
        print(json.dumps({
            "frames": int(out.shape[0]),
            "shape": list(out.shape),
            "output": args.output,
        }))
        return 0

    if not args.input or not args.output:
        print("--input/--output required (or --synthetic)", file=sys.stderr)
        return 2
    result = stab.stabilize_video(
        args.input, args.output,
        warp_field_path=args.warp_fields,
        max_frames=args.frames if args.frames > 0 else -1,
    )
    print(json.dumps(result))
    return 0


def cmd_train(args) -> int:
    import numpy as np

    from pwstablenet_tpu.config import DataConfig, TrainConfig
    from pwstablenet_tpu.train.loop import synthetic_batch_iterator, train

    model_cfg = _model_cfg(args)
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        steps_per_epoch=args.steps,
        num_epochs=1,
        lr_g=args.lr,
        lr_d=args.lr,
        gan_loss=args.gan_loss,
        grad_accum_steps=args.grad_accum,
        checkpoint_dir=args.checkpoint_dir,
        log_every=args.log_every,
        checkpoint_every=args.checkpoint_every,
        scalar_log_path=args.scalar_log or "",
        tb_log_dir=args.tb_log_dir or "",
        ema_decay=args.ema_decay,
        eval_every=args.eval_every,
        debug_nans=args.debug_nans,
        fault_inject_step=args.fault_inject_step,
        seed=args.seed,
    )
    eval_fn = None
    if args.synthetic:
        batches = synthetic_batch_iterator(model_cfg, train_cfg)
        if args.eval_every > 0:
            from pwstablenet_tpu.data.synthetic import synthetic_pair_clip
            from pwstablenet_tpu.eval.hooks import make_clip_eval_hook

            stable, unstable = synthetic_pair_clip(
                24, 96, 128, seed=10_000
            )
            eval_fn = make_clip_eval_hook(
                model_cfg, unstable, stable_clip=stable, batch_windows=4
            )
    else:
        from pwstablenet_tpu.data.deepstab import (
            DeepStabDataset,
            batch_iterator,
        )

        data_cfg = DataConfig(
            data_root=args.data_root,
            crop_size=model_cfg.model_resolution,
            resize_scale_range=tuple(args.resize_scale),
            num_decode_threads=args.decode_threads,
        )
        ds = DeepStabDataset(data_cfg, model_cfg.temporal_window)
        batches = batch_iterator(ds, train_cfg.batch_size, seed=args.seed)
        if args.eval_every > 0 and args.eval_clip:
            from pwstablenet_tpu.data.video_io import read_video
            from pwstablenet_tpu.eval.hooks import make_clip_eval_hook

            clip, _ = read_video(
                args.eval_clip, max_frames=60, dtype=np.uint8
            )
            eval_fn = make_clip_eval_hook(model_cfg, clip)
    state = train(
        model_cfg, train_cfg, batches,
        resume=args.resume, max_steps=args.steps, eval_fn=eval_fn,
    )
    if args.export_params:
        import jax

        from pwstablenet_tpu.train import checkpoint as ckpt
        from pwstablenet_tpu.train.state import generator_params

        # inference-only export (EMA weights when tracked) — loadable
        # via `stabilize --checkpoint <path>`
        ckpt.save_params(
            args.export_params, jax.device_get(generator_params(state))
        )
    return 0


def cmd_bench(args) -> int:
    import importlib.util
    import os

    # bench.py lives at the repo root (the driver contract); import it
    # as a module so this works from any cwd.
    path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "bench.py")
    )
    spec = importlib.util.spec_from_file_location("pwstable_bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main()


def cmd_eval(args) -> int:
    import numpy as np

    from pwstablenet_tpu.data import video_io
    from pwstablenet_tpu.eval.metrics import stability_report

    frames, _ = video_io.read_video(args.input)
    original = None
    if args.original:
        original, _ = video_io.read_video(args.original)
    print(json.dumps(stability_report(frames, original)))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pwstablenet_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("stabilize", help="stabilize a video")
    _add_model_args(s)
    s.add_argument("--input")
    s.add_argument("--output")
    s.add_argument("--checkpoint")
    s.add_argument("--warp-fields", help="save warp fields to .npz")
    s.add_argument("--warp-dtype", choices=["float32", "float16"],
                   default="float32",
                   help="dtype warp fields cross device->host in "
                        "(float16 halves the flow D2H bytes)")
    s.add_argument("--batch-windows", type=int, default=8)
    s.add_argument("--border-crop", type=float, default=0.0)
    s.add_argument("--synthetic", action="store_true",
                   help="use a procedural clip instead of --input")
    s.add_argument("--frames", type=int, default=-1)
    s.add_argument("--height", type=int, default=480)
    s.add_argument("--width", type=int, default=832)
    s.set_defaults(fn=cmd_stabilize)

    t = sub.add_parser("train", help="adversarial DeepStab training")
    _add_model_args(t)
    t.add_argument("--data-root", default="DeepStab")
    t.add_argument("--synthetic", action="store_true")
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--steps", type=int, default=1000)
    t.add_argument("--checkpoint-dir", default="checkpoints")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--lr", type=float, default=2e-4)
    t.add_argument("--gan-loss", choices=["lsgan", "vanilla", "hinge"],
                   default="lsgan")
    t.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batch gradient accumulation steps")
    t.add_argument("--log-every", type=int, default=50)
    t.add_argument("--scalar-log",
                   help="also append JSONL scalars to this file")
    t.add_argument("--tb-log-dir",
                   help="write TensorBoard event files here "
                        "(dependency-free writer)")
    t.add_argument("--eval-every", type=int, default=0,
                   help="stabilize + score a held-out clip every N steps")
    t.add_argument("--eval-clip",
                   help="held-out unstable video for --eval-every "
                        "(DeepStab mode; synthetic mode generates one)")
    t.add_argument("--ema-decay", type=float, default=0.0,
                   help="track an EMA of generator params (0 = off); "
                        "exported/preferred for inference")
    t.add_argument("--export-params",
                   help="after training, save inference-only generator "
                        "params (EMA if tracked) to this path")
    t.add_argument("--resize-scale", type=float, nargs=2,
                   default=[1.0, 1.0], metavar=("MIN", "MAX"),
                   help="random scale-jitter range before the crop")
    t.add_argument("--decode-threads", type=int, default=2)
    t.add_argument("--checkpoint-every", type=int, default=500)
    t.add_argument("--debug-nans", action="store_true")
    t.add_argument("--fault-inject-step", type=int, default=-1)
    t.add_argument("--seed", type=int, default=0)
    t.set_defaults(fn=cmd_train)

    b = sub.add_parser("bench", help="run the benchmark suite")
    b.set_defaults(fn=cmd_bench)

    e = sub.add_parser("eval", help="stabilization quality metrics")
    e.add_argument("--input", required=True, help="stabilized video")
    e.add_argument("--original", help="original unstable video")
    e.set_defaults(fn=cmd_eval)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
