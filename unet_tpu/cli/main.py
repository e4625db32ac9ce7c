"""Unified CLI — the reference's script zoo as subcommands.

  infer     the 22 infer_* scripts via --preset (pipeline.presets)
  train     the tools/train*.py family via --recipe (train.recipes)
  inspect   tools/inspect_tool.py serve-style video/image inspection
  export    tools/export_onnx.py equivalent via jax.export AOT
  bench     throughput measurement (bench.py logic, importable)

Run `python -m unet_tpu.cli <cmd> --help`.
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path
from typing import Optional


def _ensure_backend() -> None:
    """Fall back to CPU when the accelerator plugin is absent/unhealthy, and
    enable the persistent compilation cache (512^2 graphs compile in tens of
    seconds cold; cached reloads are near-instant)."""
    import os

    import jax

    from unet_tpu.core.config import enable_compilation_cache
    enable_compilation_cache()
    # UNET_TPU_PLATFORM pins the backend via jax.config (which wins even
    # where the launcher force-sets JAX_PLATFORMS above the environment) —
    # e.g. UNET_TPU_PLATFORM=cpu runs the CLI on a host without a healthy
    # accelerator/tunnel instead of hanging on device discovery
    plat = os.environ.get("UNET_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    try:
        jax.devices()
    except RuntimeError as e:
        print(f"note: accelerator backend unavailable ({e}); using CPU")
        jax.config.update("jax_platforms", "cpu")


def _build_model(num_classes: int, arch: str, dtype_str: str):
    import jax.numpy as jnp

    from unet_tpu.models import LightweightNestedUNet, NestedUNet, SimpleUNet

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_str]
    if arch == "nested_unet":
        return NestedUNet(num_classes=num_classes, deep_supervision=True, dtype=dtype)
    if arch == "nested_unet_resnet50":
        return NestedUNet(num_classes=num_classes, deep_supervision=True,
                          pretrained_encoder=True, dtype=dtype)
    if arch == "simple_unet":
        return SimpleUNet(num_classes=num_classes, dtype=dtype)
    if arch.startswith("lightweight"):
        enc = arch.split(":", 1)[1] if ":" in arch else "mobilenet_v3_small"
        return LightweightNestedUNet(num_classes=num_classes, encoder=enc, dtype=dtype)
    raise SystemExit(f"unknown arch {arch!r}")


def cmd_infer(args) -> int:
    _ensure_backend()
    from unet_tpu.pipeline import (EngineConfig, InferenceEngine, engine_hints,
                                   get_preset)
    from unet_tpu.inspect import ThresholdConfig

    if args.config:
        # pipeline YAML, or a legacy AppCfg / RefactorConfig layout
        # (reference infer_video_refactored.py --config workflow)
        from unet_tpu.core.config import load_pipeline_yaml
        cfg = load_pipeline_yaml(args.config)
    else:
        preset_kwargs = {}
        if args.preset == "two_stage":
            preset_kwargs = dict(sensitivity=args.burr_sensitivity,
                                 rotate=args.rotate,
                                 normalize=args.normalize_resolution)
        cfg = get_preset(args.preset, **preset_kwargs)
    if args.model_size:
        cfg = cfg.replace_in(
            "preprocess", model_size=(args.model_size, args.model_size))

    w, h = cfg.preprocess.model_size
    model, variables, num_classes, arch = _load_model(
        args, cfg.segment.num_classes, init_hw=(h, w))
    if num_classes != cfg.segment.num_classes:
        print(f"note: checkpoint has {num_classes} classes; "
              f"overriding preset's {cfg.segment.num_classes}")
        cfg = cfg.replace_in("segment", num_classes=num_classes)

    # phase-packed MXU forward: auto-on for the custom-encoder NestedUNet
    # (the only arch it supports), unless the user forces it off
    use_fast = {"auto": arch == "nested_unet", "on": True, "off": False}[args.fast]
    if use_fast:
        cfg = cfg.replace_in("segment", fast_forward=True)

    if args.int8:
        # post-training int8: calibrate activation scales on frames STRIDED
        # across the whole video (an unrepresentative intro — dark / flat /
        # fade-in — would yield tiny amax scales and silently saturate later
        # activations at 127), then run the quantized forward
        # (models/quantized.py)
        if arch != "nested_unet":
            raise SystemExit("--int8 requires the custom-encoder NestedUNet")
        from pathlib import Path as _Path

        from unet_tpu.io.video import ImageDirReader, VideoReader
        from unet_tpu.pipeline import stages

        n_calib = 16
        if _Path(args.video).is_dir():
            src = ImageDirReader(args.video)
            stride = max(1, len(src.paths) // n_calib)
            src.paths = src.paths[::stride][:n_calib]
        else:
            probe = VideoReader(args.video)
            total = probe.meta.total_frames
            probe.cap.release()
            stride = max(1, total // n_calib)
            src = VideoReader(args.video, stride, n_calib)
        try:
            batch = next(iter(src.batches(n_calib)), None)
        finally:
            cap = getattr(src, "cap", None)
            if cap is not None:
                cap.release()
        if batch is None:
            raise SystemExit(f"--int8: no frames decodable from {args.video}")
        _, frames, n_valid = batch
        fcfg = cfg
        valid = frames[:max(n_valid, 1)]
        # interleaved calib/holdout split: even-strided frames calibrate,
        # odd-strided frames feed the agreement gate, so on short videos
        # (< 2*n_calib frames, where strided sampling returns few distinct
        # frames) the gate never scores the exact frames it calibrated on —
        # an in-sample agreement check would overstate int8 fidelity
        calib = valid[0::2] if len(valid) >= 2 else valid
        holdout = valid[1::2][:8] if len(valid) >= 2 else valid
        cfg = stages.calibrate_int8(model, variables, cfg, [calib])
        print(f"int8: calibrated on {len(calib)} frames "
              f"(stride {stride} across the video, "
              f"{len(holdout)} held out for the agreement gate)")
        # accuracy gate with auto-fallback: int8 must agree with the float
        # pipeline on HELD-OUT frames (the labeled-data gate lives in
        # tests/test_quantized.py: mIoU delta <= 0.5%)
        agree = stages.validate_int8(model, variables, fcfg, cfg, holdout)
        if agree < 0.995:
            print(f"int8: class-map agreement {agree:.4f} < 0.995 on this "
                  f"video; falling back to the bf16 forward")
            cfg = fcfg
        else:
            print(f"int8: class-map agreement {agree:.4f} (gate 0.995)")

    if args.config:
        # a plain pipeline YAML saved from a named preset keeps that
        # preset's engine behavior (window mode, event gate, tracker, ...):
        # cfg.name round-trips through the YAML, so look it up — unknown
        # names get {}
        hints = engine_hints(cfg.name)
        if cfg.name == "refactor_cfg":
            # the reference's refactored pipeline runs the EventDetector
            # over the measured ratios (infer_video_refactored.py:245-380);
            # carry the YAML's event section into the engine
            import yaml as _yaml

            from unet_tpu.inspect import EventConfig as _DetEventCfg
            ev = (_yaml.safe_load(Path(args.config).read_text())
                  or {}).get("event") or {}
            allowed = {f.name for f in dataclasses.fields(_DetEventCfg)}
            hints = dict(
                event_detector_enabled=True,
                event_cfg=_DetEventCfg(
                    **{k: v for k, v in ev.items() if k in allowed}))
    else:
        hints = engine_hints(args.preset)
    if args.window is not None:
        hints["window_enabled"] = bool(args.window)
    if hints.get("window_enabled") and not cfg.geometry.enabled:
        cfg = cfg.replace_in("geometry", enabled=True)
    ecfg = EngineConfig(
        batch=args.batch, frame_stride=args.frame_stride,
        turn_hz=args.turn_hz,
        print_interval=args.print_interval, write_video=not args.no_video,
        output_dir=args.output, thresholds=ThresholdConfig(), **hints)
    engine = InferenceEngine(model, variables, cfg, ecfg)
    engine.process_video(args.video, max_frames=args.max_frames)
    return 0


def _arch_from_info(info: dict, default: str) -> str:
    kind = info.get("kind")
    if kind == "simple_unet":
        return "simple_unet"
    if kind == "nested_unet_resnet50":
        return "nested_unet_resnet50"
    return default


def _load_model(args, fallback_classes: int, init_hw=None):
    """(model, variables, num_classes, arch) from --model, or random
    weights (smoke mode) initialized at `init_hw` (default --image-size)."""
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.checkpoint import load_model_variables

    if args.model:
        variables, info = load_model_variables(args.model)
        num_classes = int(info.get("num_classes", fallback_classes))
        arch = _arch_from_info(info, args.arch)
        return (_build_model(num_classes, arch, args.dtype), variables,
                num_classes, arch)
    print("warning: no --model given; using random weights (smoke mode)")
    model = _build_model(fallback_classes, args.arch, args.dtype)
    if init_hw is None:
        size = getattr(args, "image_size", None) or 512
        init_hw = (size, size)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1,) + tuple(init_hw) + (3,)), train=False)
    return model, variables, fallback_classes, args.arch


def cmd_evaluate(args) -> int:
    """Dataset mIoU/precision/recall + confusion CSV/JSON
    (reference tools/evaluate.py:22-114)."""
    _ensure_backend()
    import json as _json
    import os

    from unet_tpu.data.dataset import SegmentationDataset
    from unet_tpu.tools import evaluate_dataset

    model, variables, num_classes, _ = _load_model(args, args.num_classes)
    split_dir = os.path.join(args.data_root, args.split)
    if not os.path.isdir(split_dir) and args.split == "test":
        split_dir = os.path.join(args.data_root, "val")
        print("note: no test split; evaluating on val")
    ds = SegmentationDataset(os.path.join(split_dir, "images"),
                             os.path.join(split_dir, "masks"),
                             augment=False,
                             target_size=(args.image_size, args.image_size))
    result = evaluate_dataset(model, variables, ds, num_classes,
                              batch_size=args.batch, output_dir=args.output)
    result.pop("confusion", None)
    print(_json.dumps(result, indent=2))
    return 0


def cmd_train(args) -> int:
    _ensure_backend()
    from unet_tpu.train.recipes import run_recipe

    return run_recipe(args)


def cmd_inspect(args) -> int:
    _ensure_backend()
    from unet_tpu.serve.inspect_tool import run_inspection

    return run_inspection(args.config, args.video, args.output)


def cmd_export(args) -> int:
    _ensure_backend()
    if args.pipeline:
        from unet_tpu.export.aot import export_pipeline

        h, w = (int(v) for v in args.frame_hw.split(","))
        export_pipeline(args.model, args.output, preset=args.pipeline,
                        batch=args.batch, frame_hw=(h, w), arch=args.arch)
        return 0
    from unet_tpu.export.aot import export_model

    export_model(args.model, args.output, arch=args.arch,
                 input_size=args.input_size, batch=args.batch)
    return 0


def cmd_serve(args) -> int:
    """Serve N videos/cameras through one fixed-batch compiled step
    (serve/multistream.py). The reference would need one process per video;
    here every stream is a slot in a single device batch."""
    _ensure_backend()
    import json as _json

    from unet_tpu.pipeline import get_preset
    from unet_tpu.serve.service import open_sources, serve_streams

    cfg = get_preset(args.preset)
    if args.model_size:
        cfg = cfg.replace_in(
            "preprocess", model_size=(args.model_size, args.model_size))
    w, h = cfg.preprocess.model_size
    model, variables, num_classes, arch = _load_model(
        args, cfg.segment.num_classes, init_hw=(h, w))
    if num_classes != cfg.segment.num_classes:
        cfg = cfg.replace_in("segment", num_classes=num_classes)
    if arch == "nested_unet":
        cfg = cfg.replace_in("segment", fast_forward=True)

    named = open_sources(args.videos, args.cameras,
                         frame_stride=args.frame_stride,
                         max_frames=args.max_frames)
    print(f"serving {len(named)} streams "
          f"({', '.join(n for n, _ in named)}) -> {args.output}")
    summary = serve_streams(model, variables, cfg, named, args.output,
                            burr_event_px=args.burr_event_px)
    print(_json.dumps(summary, indent=2))
    return 0


def cmd_bench(args) -> int:
    import bench

    argv = ["--config", str(args.config)]
    if args.int8:
        argv.append("--int8")
    bench.main(argv)
    return 0



# per-tool required flags (shared optional subparser flags -> argparse can't
# enforce them); entries are flag names, tuples mean "at least one of"
_TOOL_REQUIRES = {
    "extract-frames": ["video", "out"],
    "audit": ["labelme_dir"],
    "class-dist": ["mask_dir"],
    "remap-masks": ["mask_dir", "out", "mapping"],
    "prepare-dataset": ["labelme_dir", "images_dir", "out"],
    "hard-negatives": ["videos_dir", "out"],
    "calibrate-roi": ["video"],
    "calibrate-scale": ["points", "known_mm"],
    "diagnose-mask": [("mask", "mask_dir")],
    "update-dataset": ["images_dir", "mask_dir", "out"],
    "render-masks": ["images_dir", "mask_dir", "out"],
    "render-predictions": ["images_dir", "out"],
    "annotate": ["out", "frame_id", "filename", "box"],
    "annotate-to-labelme": ["annotations_dir", "images_dir", "out"],
    "summarize-checkpoints": ["ckpt_dir"],
}


def _cmd_tools_interactive(args) -> int:
    """Mouse-driven variants of annotate / calibrate-roi / calibrate-scale
    (reference tools/annotate_burr.py, tools/calibrate_roi.py,
    tools/calibrate_scale.py). Sessions are the event state machines in
    tools/interactive.py; this just attaches them to a cv2 window."""
    import json as _json

    from unet_tpu.tools import interactive as I

    def first_frame():
        import cv2
        if args.video:
            cap = cv2.VideoCapture(args.video)
            ok, frame = cap.read()
            cap.release()
            if not ok:
                raise SystemExit(f"cannot read a frame from {args.video}")
            return frame
        if args.filename:
            im = cv2.imread(args.filename)
            if im is None:
                raise SystemExit(f"cannot read {args.filename}")
            return im
        raise SystemExit("--video or --filename is required")

    if args.tool == "annotate":
        if not (args.frames_dir and args.out):
            raise SystemExit("annotate --interactive needs --frames-dir + --out")
        sess = I.AnnotationSession(args.frames_dir, args.out)
        I.run_window(sess, window="annotate burrs")
        print(f"{len(sess.annotations)} frames annotated -> {args.out}")
    elif args.tool == "calibrate-roi":
        sess = I.RoiCalibrationSession(first_frame(),
                                       out_path=args.out or "roi.json")
        I.run_window(sess, window="calibrate ROI")
        print(f"ROI: {sess.roi}" + (f" -> {sess.out_path}" if sess.saved
                                    else " (not saved)"))
    elif args.tool == "calibrate-scale":
        if args.known_mm is None:
            raise SystemExit("calibrate-scale --interactive needs --known-mm")
        sess = I.ScaleCalibrationSession(first_frame(), args.known_mm)
        I.run_window(sess, window="calibrate scale")
        if sess.mm_per_px is None:
            raise SystemExit("need two clicked points")
        out = {"mm_per_px": sess.mm_per_px, "known_mm": args.known_mm}
        print(_json.dumps(out))
        if args.out:
            from pathlib import Path
            Path(args.out).write_text(_json.dumps(out, indent=2))
    else:
        raise SystemExit(f"tools {args.tool} has no --interactive mode")
    return 0


def cmd_tools(args) -> int:
    from unet_tpu import tools as T

    if getattr(args, "interactive", False):
        return _cmd_tools_interactive(args)

    for req in _TOOL_REQUIRES.get(args.tool, []):
        names = req if isinstance(req, tuple) else (req,)
        if not any(getattr(args, n, None) not in (None, "", [])
                   for n in names):
            opts = " or ".join("--" + n.replace("_", "-") for n in names)
            raise SystemExit(f"tools {args.tool}: {opts} is required")

    if args.tool == "extract-frames":
        roi = tuple(map(int, args.roi.split(","))) if args.roi else None
        T.extract_frames(args.video, args.out, fps=args.fps, roi=roi,
                         dedup=args.dedup)
    elif args.tool == "audit":
        import json as _json
        report = T.audit_labelme_dir(args.labelme_dir)
        print(_json.dumps({k: (v if not isinstance(v, list) else len(v))
                           for k, v in report.items()}, indent=2))
        if args.out:
            from pathlib import Path
            Path(args.out).write_text(_json.dumps(report, indent=2, default=str))
    elif args.tool == "class-dist":
        import json as _json
        print(_json.dumps(T.class_pixel_distribution(args.mask_dir,
                                                     args.num_classes), indent=2))
    elif args.tool == "remap-masks":
        mapping = dict(pair.split(":") for pair in args.mapping.split(","))
        n = T.remap_masks(args.mask_dir, args.out,
                          {int(k): int(v) for k, v in mapping.items()})
        print(f"remapped {n} masks")
    elif args.tool == "prepare-dataset":
        from unet_tpu.data.labelme import prepare_dataset
        prepare_dataset(args.labelme_dir, args.images_dir, args.out)
    elif args.tool == "hard-negatives":
        T.create_hard_negative_dataset(args.videos_dir, args.out,
                                       num_frames=args.num_frames)
    elif args.tool == "calibrate-roi":
        roi = T.propose_roi_from_video(args.video)
        T.save_roi_json(args.out or "roi.json", roi["x"], roi["y"],
                        roi["w"], roi["h"])
        print(f"proposed ROI: {roi}")
    elif args.tool == "calibrate-scale":
        # two points spanning a known distance -> mm/px
        # (reference tools/calibrate_scale.py:17-52, headless)
        import json as _json
        vals = [float(v) for v in args.points.split(",")]
        if len(vals) != 4:
            raise SystemExit("--points must be x1,y1,x2,y2")
        mm_per_px = T.scale_from_two_points(
            (vals[0], vals[1]), (vals[2], vals[3]), args.known_mm)
        out = {"mm_per_px": mm_per_px, "known_mm": args.known_mm}
        print(_json.dumps(out))
        if args.out:
            from pathlib import Path
            Path(args.out).write_text(_json.dumps(out, indent=2))
    elif args.tool == "diagnose-mask":
        # mask value-integrity report (reference tools/diagnose_mask.py)
        import json as _json
        import os

        from unet_tpu.data.dataset import imread_mask
        paths = ([os.path.join(args.mask_dir, f)
                  for f in sorted(os.listdir(args.mask_dir))
                  if f.lower().endswith(".png")]
                 if args.mask_dir else [args.mask])
        resized = (tuple(int(v) for v in args.resize.split(","))
                   if args.resize else None)
        report = {p: T.diagnose_mask(imread_mask(p), args.num_classes,
                                     resized_hw=resized)
                  for p in paths}
        print(_json.dumps(report, indent=2, default=str))
    elif args.tool == "update-dataset":
        counts = T.update_dataset(args.images_dir, args.mask_dir, args.out,
                                  val_ratio=args.val_ratio,
                                  test_ratio=args.test_ratio, seed=args.seed)
        print(f"split counts: {counts}")
    elif args.tool == "render-masks":
        n = T.render_masks(args.images_dir, args.mask_dir, args.out,
                           limit=args.limit)
        print(f"rendered {n} overlays to {args.out}")
    elif args.tool == "render-predictions":
        _ensure_backend()
        from unet_tpu.tools import SingleImageInference
        model, variables, num_classes, _ = _load_model(args, args.num_classes)
        inf = SingleImageInference(model, variables,
                                   input_size=args.image_size or 512,
                                   num_classes=num_classes)
        n = T.render_predictions(inf, args.images_dir, args.mask_dir, args.out,
                                 limit=args.limit)
        print(f"rendered {n} comparison grids to {args.out}")
    elif args.tool == "annotate":
        # headless rectangle burr annotation: same burr_annotations.json
        # schema as the reference's mouse tool (tools/annotate_burr.py)
        ann = T.load_annotations(args.out)
        try:
            boxes = [[float(v) for v in b.split(",")] for b in args.box]
        except ValueError:
            raise SystemExit("--box must be x1,y1,x2,y2") from None
        if any(len(b) != 4 for b in boxes):
            raise SystemExit("--box must be x1,y1,x2,y2")
        T.add_boxes(ann, args.frame_id, args.filename, boxes,
                    replace=args.replace)
        path = T.save_annotations(args.out, ann)
        n = len(ann[str(args.frame_id)]["burr_regions"])
        print(f"frame {args.frame_id}: {n} boxes -> {path}")
    elif args.tool == "annotate-to-labelme":
        ann = T.load_annotations(args.annotations_dir)
        n = T.annotations_to_labelme(ann, args.images_dir, args.out,
                                     label=args.label)
        print(f"wrote {n} labelme JSONs to {args.out}")
    elif args.tool == "summarize-checkpoints":
        from unet_tpu.tools.evaluate import summarize_checkpoints
        summarize_checkpoints(args.ckpt_dir)
    else:
        raise SystemExit(f"unknown tool {args.tool!r}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="unet_tpu", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("infer", help="video/image-dir inference with a preset")
    pi.add_argument("--video", required=True, help="video file or image dir")
    pi.add_argument("--output", required=True)
    pi.add_argument("--preset", default="two_stage")
    pi.add_argument("--config", default=None,
                    help="pipeline YAML (or legacy AppCfg/RefactorConfig "
                         "layout) overriding --preset")
    pi.add_argument("--model", default=None, help=".pth or orbax checkpoint dir")
    pi.add_argument("--arch", default="nested_unet")
    pi.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    pi.add_argument("--batch", type=int, default=8)
    pi.add_argument("--frame-stride", type=int, default=1)
    pi.add_argument("--max-frames", type=int, default=None)
    pi.add_argument("--print-interval", type=int, default=60)
    pi.add_argument("--no-video", action="store_true")
    pi.add_argument("--model-size", type=int, default=None)
    pi.add_argument("--rotate", action="store_true",
                    help="rotate 90 CCW (reference --rotate)")
    pi.add_argument("--normalize-resolution", action="store_true",
                    help="resize to 800x448 (reference --normalize-resolution)")
    pi.add_argument("--burr-sensitivity", default="medium",
                    choices=["low", "medium", "high"])
    pi.add_argument("--window", type=int, default=None, choices=[0, 1],
                    help="force window/production mode on (1) or off (0); "
                         "default follows the preset")
    pi.add_argument("--turn-hz", type=float, default=None,
                    help="turn-rate frame sampling (reference infer_video.py)")
    pi.add_argument("--fast", default="auto", choices=["auto", "on", "off"],
                    help="phase-packed MXU forward (models/fast_forward.py)")
    pi.add_argument("--int8", action="store_true",
                    help="int8 quantized forward, calibrated on the video's "
                         "first frames (models/quantized.py)")
    pi.set_defaults(fn=cmd_infer)

    pt = sub.add_parser("train", help="training recipes (tools/train*.py family)")
    pt.add_argument("--recipe", default="3class_advanced")
    pt.add_argument("--data-root", required=True)
    pt.add_argument("--output", default="checkpoints")
    pt.add_argument("--epochs", type=int, default=None)
    pt.add_argument("--batch", type=int, default=8)
    pt.add_argument("--image-size", type=int, default=None)
    pt.add_argument("--resume", default=None)
    pt.add_argument("--seed", type=int, default=42)
    pt.add_argument("--n-devices", type=int, default=None)
    pt.add_argument("--encoder", default="mobilenet_v3_small")
    pt.add_argument("--train-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="compute dtype for training (params stay float32); "
                         "bfloat16 is the reference's AMP analogue")
    pt.add_argument("--remat", action="store_true",
                    help="rematerialize ConvBlocks in backward (fits larger "
                         "batch/resolution in HBM at ~30%% recompute)")
    pt.set_defaults(fn=cmd_train)

    ps = sub.add_parser("inspect", help="yaml-config inspection serve")
    ps.add_argument("--config", required=True)
    ps.add_argument("--video", required=True)
    ps.add_argument("--output", default="./inspection_output")
    ps.set_defaults(fn=cmd_inspect)

    pe = sub.add_parser("export", help="AOT export (StableHLO via jax.export)")
    pe.add_argument("--model", required=True)
    pe.add_argument("--output", required=True)
    pe.add_argument("--arch", default="nested_unet")
    pe.add_argument("--input-size", type=int, default=512)
    pe.add_argument("--batch", type=int, default=None,
                    help="None = dynamic batch dim (reference export_onnx.py)")
    pe.add_argument("--pipeline", default=None,
                    help="export the FULL fused pipeline step for this preset "
                         "(preprocess+forward+burr+stats) instead of the bare "
                         "model forward")
    pe.add_argument("--frame-hw", default="448,800",
                    help="input frame H,W for --pipeline artifacts")
    pe.set_defaults(fn=cmd_export)


    pv = sub.add_parser("evaluate", help="dataset mIoU + confusion CSV/JSON")
    pv.add_argument("--model", default=None, help=".pth or orbax checkpoint dir")
    pv.add_argument("--arch", default="nested_unet")
    pv.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    pv.add_argument("--data-root", required=True,
                    help="root with <split>/images + <split>/masks")
    pv.add_argument("--split", default="test")
    pv.add_argument("--num-classes", type=int, default=3)
    pv.add_argument("--image-size", type=int, default=512)
    pv.add_argument("--batch", type=int, default=8)
    pv.add_argument("--output", default=None,
                    help="dir for confusion_matrix.csv + metrics.json")
    pv.set_defaults(fn=cmd_evaluate)

    pk = sub.add_parser("tools", help="dataset/calibration utilities")
    pk.add_argument("tool", choices=["extract-frames", "audit", "class-dist",
                                     "remap-masks", "prepare-dataset",
                                     "hard-negatives", "calibrate-roi",
                                     "calibrate-scale", "diagnose-mask",
                                     "update-dataset", "render-masks",
                                     "render-predictions", "annotate",
                                     "annotate-to-labelme",
                                     "summarize-checkpoints"])
    pk.add_argument("--video", default=None)
    pk.add_argument("--videos-dir", default=None)
    pk.add_argument("--labelme-dir", default=None)
    pk.add_argument("--images-dir", default=None)
    pk.add_argument("--mask-dir", default=None)
    pk.add_argument("--mask", default=None, help="single mask png (diagnose-mask)")
    pk.add_argument("--out", default=None)
    pk.add_argument("--fps", type=float, default=5.0)
    pk.add_argument("--roi", default="")
    pk.add_argument("--dedup", type=float, default=0.97)
    pk.add_argument("--num-classes", type=int, default=7)
    pk.add_argument("--num-frames", type=int, default=200)
    pk.add_argument("--mapping", default="")
    pk.add_argument("--points", default="",
                    help="x1,y1,x2,y2 for calibrate-scale")
    pk.add_argument("--known-mm", type=float, default=None,
                    help="real distance between --points")
    pk.add_argument("--resize", default=None,
                    help="H,W to test nearest-resize value preservation")
    pk.add_argument("--val-ratio", type=float, default=0.1)
    pk.add_argument("--test-ratio", type=float, default=0.1)
    pk.add_argument("--seed", type=int, default=42)
    pk.add_argument("--limit", type=int, default=None)
    pk.add_argument("--frame-id", type=int, default=None,
                    help="frame id to annotate (annotate)")
    pk.add_argument("--filename", default=None,
                    help="frame image filename (annotate)")
    pk.add_argument("--box", action="append", default=[],
                    help="x1,y1,x2,y2 burr rectangle; repeatable (annotate)")
    pk.add_argument("--replace", action="store_true",
                    help="replace the frame's existing boxes (annotate)")
    pk.add_argument("--annotations-dir", default=None,
                    help="dir holding burr_annotations.json (annotate-to-labelme)")
    pk.add_argument("--label", default="burr_defect",
                    help="labelme class label (annotate-to-labelme)")
    pk.add_argument("--interactive", action="store_true",
                    help="mouse-driven cv2 window (annotate / calibrate-roi /"
                         " calibrate-scale); needs a display — headless hosts"
                         " use the flag-driven variants")
    pk.add_argument("--frames-dir", default=None,
                    help="extracted-frames dir (annotate --interactive)")
    pk.add_argument("--ckpt-dir", default=None,
                    help="checkpoint dir (summarize-checkpoints)")
    pk.add_argument("--model", default=None)
    pk.add_argument("--arch", default="nested_unet")
    pk.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    pk.add_argument("--image-size", type=int, default=512)
    pk.set_defaults(fn=cmd_tools)

    pm = sub.add_parser(
        "serve", help="serve N videos/cameras through one batched device step")
    pm.add_argument("--videos", nargs="*", default=[],
                    help="video files and/or image dirs, one stream each")
    pm.add_argument("--cameras", nargs="*", default=[],
                    help="GigE specs <cti_path>[:serial], one stream each")
    pm.add_argument("--output", required=True)
    pm.add_argument("--preset", default="wrap_7class")
    pm.add_argument("--model", default=None, help=".pth or orbax checkpoint dir")
    pm.add_argument("--arch", default="nested_unet")
    pm.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    pm.add_argument("--model-size", type=int, default=None)
    pm.add_argument("--frame-stride", type=int, default=1)
    pm.add_argument("--max-frames", type=int, default=None,
                    help="per-stream cap (required for endless cameras)")
    pm.add_argument("--burr-event-px", type=int, default=50,
                    help="burr pixel count that logs an events.jsonl entry")
    pm.set_defaults(fn=cmd_serve)

    pb = sub.add_parser("bench", help="run the throughput benchmark")
    pb.add_argument("--config", type=int, default=2,
                    choices=[1, 2, 3, 4, 5, 6],
                    help="BASELINE.json config number (6 = true end-to-end "
                         "engine loop incl. decode/upload/overlay/write)")
    pb.add_argument("--int8", action="store_true",
                    help="calibrated int8 forward (configs 2-5)")
    pb.set_defaults(fn=cmd_bench)
    return p


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
