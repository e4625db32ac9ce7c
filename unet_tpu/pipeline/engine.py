"""The inference engine: host driver around the fused device step.

Replaces the reference's 22 per-script main loops (SURVEY §1) with one
engine: batched decode -> async device dispatch (double-buffered so host
decode/visualization overlaps device compute) -> per-frame host logic
(quality gate, per-frame CSV stats, event detection, window aggregation,
OK/NG events, overlay video).

Observable outputs match the reference flagship loop
(infer_two_stage_burr.py:269-377): result.mp4 with ROI/contour overlay + HUD,
per-frame cable/tape/burr % prints, final FPS + burr-frame summary — plus the
production-mode window events (infer_video_production.py:298-456,
tools/inspect_tool.py).
"""
from __future__ import annotations

import csv
import time
from collections import deque
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from unet_tpu.events import InspectionEventLogger, EventOutputConfig
from unet_tpu.inspect import (FrameQualityGate, FrameResult, ThresholdConfig,
                              WindowAggregator, make_decision)
from unet_tpu.io.video import ImageDirReader, VideoReader, VideoWriter
from unet_tpu.pipeline import stages
from unet_tpu.pipeline.config import PipelineCfg
from unet_tpu.pipeline.visualize import draw_hud, two_stage_overlay


@dataclass
class EngineConfig:
    batch: int = 8
    frame_stride: int = 1
    # turn-rate-based sampling: stride = fps / (turn_hz * eval_per_turn)
    # (reference infer_video.py:333); overrides frame_stride when set
    turn_hz: Optional[float] = None
    eval_per_turn: int = 4
    print_interval: int = 60
    write_video: bool = True
    output_dir: str = "./output"
    # window/production mode (requires cfg.geometry.enabled)
    window_enabled: bool = False
    window_duration_sec: float = 3.0
    window_min_frames: int = 6
    window_max_frames: int = 12
    thresholds: ThresholdConfig = field(default_factory=ThresholdConfig)
    camera_id: str = "cam0"
    max_in_flight: int = 2  # device batches in flight (double buffering)


class InferenceEngine:
    def __init__(self, model, variables, cfg: PipelineCfg,
                 engine_cfg: Optional[EngineConfig] = None):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.ecfg = engine_cfg or EngineConfig()
        self.step = stages.build_step(model, cfg)
        self.quality_gate: Optional[FrameQualityGate] = None

    def _host_preprocess(self, frame: np.ndarray, hw) -> np.ndarray:
        """Mirror the device-side geometric preprocess (rotate/normalize) on
        the host copy used for overlays, so masks line up."""
        import cv2
        if self.cfg.preprocess.rotate90_ccw:
            frame = cv2.rotate(frame, cv2.ROTATE_90_COUNTERCLOCKWISE)
        if frame.shape[:2] != tuple(hw):
            frame = cv2.resize(frame, (hw[1], hw[0]))
        return frame

    # -- host-side consumers -------------------------------------------------

    def _consume(self, ids: List[int], frames: np.ndarray, n_valid: int,
                 out, state: Dict[str, Any]) -> None:
        class_map = np.asarray(out.class_map)
        cable_px = np.asarray(out.cable_px)
        tape_px = np.asarray(out.tape_px)
        burr_px = np.asarray(out.burr_px)
        h, w = class_map.shape[-2:]

        roi = None
        if self.cfg.roi is not None:
            r = self.cfg.roi.scaled((w, h)) if self.cfg.roi.space != (w, h) else self.cfg.roi
            roi = (r.x1, r.y1, r.x2, r.y2)
        roi_area = ((roi[2] - roi[0]) * (roi[3] - roi[1])) if roi else h * w

        for i in range(n_valid):
            fid = ids[i]
            state["processed"] += 1
            cable_ratio = cable_px[i] / roi_area * 100
            tape_ratio = tape_px[i] / roi_area * 100
            burr_ratio = burr_px[i] / roi_area * 100
            has_burr = burr_px[i] > 0
            if has_burr:
                state["burr_frames"] += 1
            status = "[BURR!]" if has_burr else "[OK]"

            state["csv_rows"].append([fid, f"{cable_ratio:.2f}", f"{tape_ratio:.2f}",
                                      f"{burr_ratio:.2f}", int(burr_px[i]), status])

            if state["writer"] is not None:
                frame = self._host_preprocess(frames[i], (h, w))
                vis = two_stage_overlay(frame, class_map[i], roi)
                elapsed = time.time() - state["t0"]
                fps_now = state["processed"] / elapsed if elapsed > 0 else 0.0
                draw_hud(vis, [
                    f"Frame: {fid} | FPS: {fps_now:.1f}",
                    f"{status} Cable:{cable_ratio:.1f}% Tape:{tape_ratio:.1f}% "
                    f"Burr:{burr_ratio:.1f}%",
                ])
                state["writer"].write(vis)

            if state["aggregator"] is not None and out.diameters is not None:
                state["aggregator"].add_frame(FrameResult.from_device(
                    timestamp_ns=int(fid / max(state["fps_in"], 1e-6) * 1e9),
                    frame_id=fid, diameter=out.diameters, index=i))
                if state["aggregator"].is_ready():
                    stats = state["aggregator"].get_statistics()
                    decision = make_decision(stats, self.ecfg.thresholds)
                    state["decisions"].append(decision)
                    if state["event_logger"] is not None:
                        frame = frames[i]
                        vis = two_stage_overlay(frame, class_map[i], roi)
                        state["event_logger"].log_event(
                            decision, stats, frame_bgr=frame, overlay_bgr=vis,
                            camera_id=self.ecfg.camera_id)
                    state["aggregator"].reset()

            if state["processed"] % self.ecfg.print_interval == 0:
                print(f"[{state['processed']:4d}] Frame {fid} {status} | "
                      f"Cable:{cable_ratio:5.1f}% Tape:{tape_ratio:5.1f}% "
                      f"Burr:{burr_ratio:5.1f}%")

    # -- main loop -----------------------------------------------------------

    def process_video(self, video_path: str, max_frames: Optional[int] = None
                      ) -> Dict[str, Any]:
        if Path(video_path).is_dir():
            source = ImageDirReader(video_path, max_frames)
        else:
            stride = self.ecfg.frame_stride
            if self.ecfg.turn_hz:
                probe = VideoReader(video_path)
                fps_in = probe.meta.fps
                probe.cap.release()
                stride = max(1, int(round(
                    fps_in / (self.ecfg.turn_hz * self.ecfg.eval_per_turn))))
            source = VideoReader(video_path, stride, max_frames)
        out_dir = Path(self.ecfg.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)

        state: Dict[str, Any] = {
            "processed": 0, "burr_frames": 0, "csv_rows": [],
            "t0": time.time(), "decisions": [], "fps_in": source.meta.fps,
            "writer": VideoWriter(str(out_dir / "result.mp4"), source.meta.fps)
            if self.ecfg.write_video else None,
            "aggregator": WindowAggregator(
                self.ecfg.window_duration_sec, self.ecfg.window_min_frames,
                self.ecfg.window_max_frames) if self.ecfg.window_enabled else None,
            "event_logger": InspectionEventLogger(EventOutputConfig(
                output_dir=str(out_dir / "events")))
            if self.ecfg.window_enabled else None,
        }

        import jax.numpy as jnp
        in_flight: deque = deque()
        for ids, frames, n_valid in source.batches(self.ecfg.batch):
            out = self.step(self.variables, jnp.asarray(frames))
            in_flight.append((ids, frames, n_valid, out))
            if len(in_flight) > self.ecfg.max_in_flight:
                self._consume(*in_flight.popleft(), state)
        while in_flight:
            self._consume(*in_flight.popleft(), state)

        if state["writer"] is not None:
            state["writer"].close()

        with open(out_dir / "events.csv", "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["frame_id", "cable_pct", "tape_pct", "burr_pct",
                         "burr_px", "status"])
            wr.writerows(state["csv_rows"])

        elapsed = time.time() - state["t0"]
        summary = {
            "processed": state["processed"],
            "elapsed_sec": round(elapsed, 2),
            "fps": round(state["processed"] / elapsed, 2) if elapsed > 0 else 0.0,
            "burr_frames": state["burr_frames"],
            "ng_windows": sum(1 for d in state["decisions"] if d.result == "NG"),
            "total_windows": len(state["decisions"]),
            "output_dir": str(out_dir),
        }
        print("-" * 70)
        print(f"done: {summary['processed']} frames in {summary['elapsed_sec']}s "
              f"(avg {summary['fps']} FPS), burr frames: {summary['burr_frames']}")
        if state["event_logger"] is not None:
            state["event_logger"].print_summary()
        return summary
