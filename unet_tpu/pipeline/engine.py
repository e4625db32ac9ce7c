"""The inference engine: host driver around the fused device step.

Replaces the reference's 22 per-script main loops (SURVEY §1) with one
engine: batched decode -> async device dispatch (double-buffered so host
decode/visualization overlaps device compute) -> per-frame host logic
(quality gate, event detection, defect tracking, wrap-uniformity monitor,
per-frame CSV stats, window aggregation, OK/NG events, overlay video).

Observable outputs match the reference flagship loop
(infer_two_stage_burr.py:269-377): result.mp4 with ROI/contour overlay + HUD,
per-frame cable/tape/burr % prints, final FPS + burr-frame summary — plus:
  * production window events + per-NG-window evidence dirs
    (infer_video_production.py:298-456, tools/inspect_tool.py)
  * quality-gate skip-with-reason rows (infer_video.py:73-118, 358-391)
  * per-event-type cooldown events (src/refactor/event_detector.py:24-175)
  * IoU-confirmed defect tracks (infer_video_optimized.py:66-189)
  * wrap_uniformity.csv THIN/THICK/uniformity log
    (infer_wrap_uniformity.py:33-131, infer_wrap_7class.py:88-90)
"""
from __future__ import annotations

import csv
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from unet_tpu.events import InspectionEventLogger, EventOutputConfig
from unet_tpu.inspect import (DefectTracker, EventConfig, EventDetector,
                              EventGate, FrameMetrics, FrameQualityGate,
                              FrameResult, ThresholdConfig, WindowAggregator,
                              WrapUniformityMonitor, make_decision)
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
    # per-NG-window evidence dirs: every window frame + overlay +
    # window_info.json (reference infer_video_production.py:299-456)
    evidence_dirs: bool = False
    # frame quality gate (requires cfg.inspect.quality_stats;
    # reference infer_video.py:73-118)
    quality_enabled: bool = False
    quality_blur_th: float = 80.0
    quality_flat_th: float = 8.0
    quality_motion_th: float = 10.0
    quality_glitch_flat_th: float = 3.0
    # consecutive-frame event detector with per-type cooldown (requires
    # cfg.geometry.enabled; reference src/refactor/event_detector.py:24-175)
    event_detector_enabled: bool = False
    event_cfg: EventConfig = field(default_factory=EventConfig)
    # N-consecutive abnormal-frame confirmation + wall-clock cooldown before
    # an event is logged (requires cfg.geometry.enabled; reference
    # infer_video_robust.py:219-239 EventGate — defined there but never
    # instantiated; here it is the robust preset's event path). A frame is
    # abnormal when the wrap ratio dt/dc leaves [gate_ratio_min,
    # gate_ratio_max] or a burr is present.
    event_gate_enabled: bool = False
    gate_hold_frames: int = 8
    gate_cooldown_sec: float = 3.0
    gate_ratio_min: float = 1.05
    gate_ratio_max: float = 1.5
    # IoU-matched multi-frame defect confirmation (requires
    # cfg.inspect.track_defects; reference infer_video_optimized.py:66-189)
    tracker_enabled: bool = False
    tracker_confirm_frames: int = 3
    tracker_iou: float = 0.3
    tracker_stale_frames: int = 10
    # wrap-uniformity monitor + CSV (requires cfg.geometry.enabled;
    # reference infer_wrap_uniformity.py:33-131)
    wrap_monitor_enabled: bool = False
    wrap_ratio_min: float = 1.05
    wrap_ratio_max: float = 1.5
    wrap_window: int = 30
    wrap_std_threshold: float = 0.15
    camera_id: str = "cam0"
    max_in_flight: int = 2  # device batches in flight (double buffering)

    def merged(self, **kw) -> "EngineConfig":
        import dataclasses
        return dataclasses.replace(self, **kw)


CLASS_NAMES = {3: "bulge_defect", 4: "loose_defect", 5: "damage_defect",
               6: "thin_defect"}


class InferenceEngine:
    def __init__(self, model, variables, cfg: PipelineCfg,
                 engine_cfg: Optional[EngineConfig] = None):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.ecfg = engine_cfg or EngineConfig()
        self.step = stages.build_step(model, cfg)
        e = self.ecfg
        self.quality_gate: Optional[FrameQualityGate] = (
            FrameQualityGate(True, e.quality_blur_th, e.quality_flat_th,
                             e.quality_motion_th, e.quality_glitch_flat_th)
            if e.quality_enabled else None)
        if self.quality_gate is not None and not cfg.inspect.quality_stats:
            raise ValueError("quality_enabled requires cfg.inspect.quality_stats "
                             "(the gate's statistics come from the device step)")
        if e.tracker_enabled and not cfg.inspect.track_defects:
            raise ValueError("tracker_enabled requires cfg.inspect.track_defects")
        # event detector + tracker carry frame-indexed state (cooldown
        # counters, track ages) and are rebuilt per process_video call —
        # frame ids restart with every video
        self.event_detector: Optional[EventDetector] = None
        self.tracker: Optional[DefectTracker] = None
        self.event_gate: Optional[EventGate] = None
        if e.event_gate_enabled and not cfg.geometry.enabled:
            raise ValueError("event_gate_enabled requires cfg.geometry.enabled "
                             "(abnormality comes from the wrap ratio)")

    def _reset_per_video(self) -> None:
        e = self.ecfg
        self.event_detector = (EventDetector(e.event_cfg)
                               if e.event_detector_enabled else None)
        self.tracker = (DefectTracker(e.tracker_confirm_frames, e.tracker_iou,
                                      e.tracker_stale_frames, CLASS_NAMES)
                        if e.tracker_enabled else None)
        # the gate's cooldown runs on VIDEO time (frame_id / source fps), not
        # wall clock: the engine processes hundreds of FPS, so a wall-clock
        # cooldown would make gated_events.csv depend on host throughput
        # (the reference's loop was real-time, where the two coincide)
        self._video_time = 0.0
        self.event_gate = (EventGate(e.gate_hold_frames, e.gate_cooldown_sec,
                                     clock=lambda: self._video_time)
                           if e.event_gate_enabled else None)

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

    def _close_window(self, state: Dict[str, Any], frame: np.ndarray,
                      vis: Optional[np.ndarray], class_map_i, roi) -> None:
        """Aggregated window is ready: decide, log, write evidence."""
        agg = state["aggregator"]
        stats = agg.get_statistics()
        decision = make_decision(stats, self.ecfg.thresholds)
        state["decisions"].append(decision)
        if state["event_logger"] is not None:
            if vis is None:
                vis = two_stage_overlay(frame, class_map_i, roi)
            state["event_logger"].log_event(
                decision, stats, frame_bgr=frame, overlay_bgr=vis,
                camera_id=self.ecfg.camera_id)
        if self.ecfg.evidence_dirs and decision.result == "NG":
            # per-window evidence dir: all frames + overlays + window_info.json
            # (reference infer_video_production.py:299-456)
            wdir = Path(self.ecfg.output_dir) / "windows" / decision.window_id
            wdir.mkdir(parents=True, exist_ok=True)
            for fid, wf, wo in state["window_frames"]:
                self._imwrite(wdir / f"frame_{fid:06d}.jpg", wf)
                self._imwrite(wdir / f"overlay_{fid:06d}.jpg", wo)
            (wdir / "window_info.json").write_text(json.dumps({
                "window_id": decision.window_id,
                "result": decision.result,
                "severity": decision.severity,
                "reasons": decision.reasons,
                "metrics": decision.metrics,
                "num_frames": stats.num_frames,
                "frame_ids": [fid for fid, _, _ in state["window_frames"]],
            }, ensure_ascii=False, indent=2), encoding="utf-8")
        state["window_frames"].clear()
        agg.reset()

    @staticmethod
    def _imwrite(path, img) -> None:
        from unet_tpu.events.emitters import _imwrite
        _imwrite(path, img)

    @staticmethod
    def _device_leaves(out) -> List[Any]:
        """Every device array the host consumers will read from a step output."""
        leaves = [out.class_map, out.cable_px, out.tape_px, out.burr_px]
        if out.quality is not None:
            leaves += list(out.quality)
        if out.defect_components is not None:
            leaves += [getattr(out.defect_components, f)
                       for f in out.defect_components._fields]
        if out.diameters is not None:
            leaves += [out.diameters.dc_px, out.diameters.dt_px]
        return leaves

    @classmethod
    def _start_download(cls, out) -> None:
        """Kick off device->host copies of all output leaves right at
        dispatch time, so the (high-latency, per-transfer round-trip)
        transfers overlap device compute and the next batches' dispatch
        instead of serializing inside _consume's np.asarray calls."""
        for leaf in cls._device_leaves(out):
            copy = getattr(leaf, "copy_to_host_async", None)
            if copy is not None:
                copy()

    def _consume(self, ids: List[int], frames: np.ndarray, n_valid: int,
                 out, state: Dict[str, Any]) -> None:
        t_dl = time.perf_counter()
        class_map = np.asarray(out.class_map)
        cable_px = np.asarray(out.cable_px)
        tape_px = np.asarray(out.tape_px)
        burr_px = np.asarray(out.burr_px)
        quality = (None if out.quality is None else
                   tuple(np.asarray(q) for q in out.quality))
        comps = (None if out.defect_components is None else
                 {f: np.asarray(getattr(out.defect_components, f))
                  for f in out.defect_components._fields})
        dc_all = dt_all = None
        if out.diameters is not None:
            dc_all = np.asarray(out.diameters.dc_px)
            dt_all = np.asarray(out.diameters.dt_px)
        t_host = time.perf_counter()
        # 'download' includes any device compute not yet drained: the first
        # np.asarray blocks until this batch's step finishes
        state["legs"]["download"] += t_host - t_dl
        h, w = class_map.shape[-2:]

        roi = None
        if self.cfg.roi is not None:
            r = self.cfg.roi.scaled((w, h)) if self.cfg.roi.space != (w, h) else self.cfg.roi
            roi = (r.x1, r.y1, r.x2, r.y2)
        roi_area = ((roi[2] - roi[0]) * (roi[3] - roi[1])) if roi else h * w

        for i in range(n_valid):
            fid = ids[i]
            state["processed"] += 1

            if self.quality_gate is not None and quality is not None:
                q = self.quality_gate.check(float(quality[0][i]),
                                            float(quality[1][i]),
                                            float(quality[2][i]))
                if q.is_bad:
                    state["skipped"].append([fid, q.reason, f"{q.lap_var:.2f}",
                                             f"{q.gray_std:.2f}", f"{q.mad:.2f}"])
                    if state["writer"] is not None:
                        frame = self._host_preprocess(frames[i], (h, w))
                        draw_hud(frame, [f"Frame: {fid} [SKIPPED] {q.reason}"])
                        state["writer"].write(frame)
                    continue

            cable_ratio = cable_px[i] / roi_area * 100
            tape_ratio = tape_px[i] / roi_area * 100
            burr_ratio = burr_px[i] / roi_area * 100
            has_burr = burr_px[i] > 0
            if has_burr:
                state["burr_frames"] += 1
            status = "[BURR!]" if has_burr else "[OK]"

            state["csv_rows"].append([fid, f"{cable_ratio:.2f}", f"{tape_ratio:.2f}",
                                      f"{burr_ratio:.2f}", int(burr_px[i]), status])

            dc_px = dt_px = None
            if dc_all is not None:
                dc_px, dt_px = float(dc_all[i]), float(dt_all[i])

            if state["wrap_monitor"] is not None and dc_px is not None:
                r = state["wrap_monitor"].update(fid, dc_px, dt_px)
                if r["is_thin"]:
                    state["wrap_events"].append((fid, "thin"))
                if r["is_thick"]:
                    state["wrap_events"].append((fid, "thick"))

            if self.event_gate is not None and dc_px is not None:
                self._video_time = fid / max(state["fps_in"], 1e-6)
                ratio = dt_px / dc_px if dc_px > 0 else None
                abnormal = bool(has_burr) or (
                    ratio is not None and not
                    (self.ecfg.gate_ratio_min <= ratio <= self.ecfg.gate_ratio_max))
                self.event_gate.update(abnormal)
                if self.event_gate.should_fire():
                    state["gated_events"].append(
                        (fid, "abnormal_confirmed",
                         f"{ratio:.3f}" if ratio is not None else "",
                         int(has_burr)))

            if self.event_detector is not None and dc_px is not None:
                ratio = dt_px / dc_px if dc_px > 0 else None
                fired = self.event_detector.add_frame(FrameMetrics(
                    frame_id=fid, dc_px=dc_px, dt_px=dt_px,
                    delta_d_px=dt_px - dc_px, ratio=ratio,
                    has_burr=bool(has_burr),
                    cable_coverage=cable_ratio / 100,
                    tape_coverage=tape_ratio / 100))
                for name in fired:
                    state["detector_events"].append((fid, name))

            if self.tracker is not None and comps is not None:
                detections = [
                    {"class_id": int(comps["class_id"][i, k]),
                     "bbox": (float(comps["left"][i, k]), float(comps["top"][i, k]),
                              float(comps["left"][i, k] + comps["width"][i, k]),
                              float(comps["top"][i, k] + comps["height"][i, k])),
                     "area": int(comps["area"][i, k])}
                    for k in range(comps["valid"].shape[-1])
                    if comps["valid"][i, k]]
                for c in self.tracker.update(detections, fid):
                    state["confirmed_defects"].append(c)

            vis = None
            frame = None
            if state["writer"] is not None or (
                    self.ecfg.evidence_dirs and state["aggregator"] is not None):
                frame = self._host_preprocess(frames[i], (h, w))
                vis = two_stage_overlay(frame, class_map[i], roi)
            if state["writer"] is not None:
                elapsed = time.time() - state["t0"]
                fps_now = state["processed"] / elapsed if elapsed > 0 else 0.0
                # HUD goes on a copy: `vis` is reused for evidence dirs and
                # event images, which must stay clean overlays (reference
                # infer_video_production.py evidence frames carry no HUD)
                hud = vis.copy()
                draw_hud(hud, [
                    f"Frame: {fid} | FPS: {fps_now:.1f}",
                    f"{status} Cable:{cable_ratio:.1f}% Tape:{tape_ratio:.1f}% "
                    f"Burr:{burr_ratio:.1f}%",
                ])
                state["writer"].write(hud)

            if state["aggregator"] is not None and out.diameters is not None:
                state["aggregator"].add_frame(FrameResult.from_device(
                    timestamp_ns=int(fid / max(state["fps_in"], 1e-6) * 1e9),
                    frame_id=fid, diameter=out.diameters, defects=out.defects,
                    index=i))
                if self.ecfg.evidence_dirs:
                    if frame is None:
                        frame = self._host_preprocess(frames[i], (h, w))
                        vis = two_stage_overlay(frame, class_map[i], roi)
                    state["window_frames"].append((fid, frame, vis))
                if state["aggregator"].is_ready():
                    if frame is None:
                        frame = self._host_preprocess(frames[i], (h, w))
                    self._close_window(state, frame, vis, class_map[i], roi)

            if state["processed"] % self.ecfg.print_interval == 0:
                print(f"[{state['processed']:4d}] Frame {fid} {status} | "
                      f"Cable:{cable_ratio:5.1f}% Tape:{tape_ratio:5.1f}% "
                      f"Burr:{burr_ratio:5.1f}%")
        state["legs"]["host"] += time.perf_counter() - t_host

    # -- main loop -----------------------------------------------------------

    def process_video(self, video_path: str, max_frames: Optional[int] = None
                      ) -> Dict[str, Any]:
        self._reset_per_video()
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
            "processed": 0, "burr_frames": 0, "csv_rows": [], "skipped": [],
            "detector_events": [], "confirmed_defects": [], "wrap_events": [],
            "gated_events": [], "window_frames": [], "batch_lat_ms": [],
            "legs": {"decode": 0.0, "upload": 0.0, "dispatch": 0.0,
                     "download": 0.0, "host": 0.0},
            "t0": time.time(), "decisions": [], "fps_in": source.meta.fps,
            "writer": VideoWriter(str(out_dir / "result.mp4"), source.meta.fps)
            if self.ecfg.write_video else None,
            "aggregator": WindowAggregator(
                self.ecfg.window_duration_sec, self.ecfg.window_min_frames,
                self.ecfg.window_max_frames) if self.ecfg.window_enabled else None,
            "event_logger": InspectionEventLogger(EventOutputConfig(
                output_dir=str(out_dir / "events")))
            if self.ecfg.window_enabled else None,
            "wrap_monitor": WrapUniformityMonitor(
                self.ecfg.wrap_ratio_min, self.ecfg.wrap_ratio_max,
                self.ecfg.wrap_window, self.ecfg.wrap_std_threshold,
                csv_path=str(out_dir / "wrap_uniformity.csv"))
            if self.ecfg.wrap_monitor_enabled else None,
        }
        if self.ecfg.wrap_monitor_enabled and not self.cfg.geometry.enabled:
            raise ValueError("wrap_monitor_enabled requires cfg.geometry.enabled")

        # 4-stage host pipeline: decode thread -> upload thread -> dispatch +
        # async-download-start (main) -> consume (sink thread). Decode of
        # batch N+3 overlaps the H->D transfer of N+2 overlaps device compute
        # + D->H copies of N+1 overlaps overlay/write of N — the reference's
        # loop is strictly sequential per frame (infer_two_stage_burr.py:269).
        # Per-leg wall time lands in state["legs"] (summary + bench config 6).
        import queue as _queue
        import threading as _threading

        import jax

        decode_q: _queue.Queue = _queue.Queue(maxsize=2)
        upload_q: _queue.Queue = _queue.Queue(
            maxsize=max(self.ecfg.max_in_flight, 1))
        errors: List[BaseException] = []
        legs = state["legs"]
        # cooperative shutdown: every blocking queue op polls `stop` so a
        # stage dying (uploader exception, main-thread exception) can never
        # leave its producer wedged on a full queue -> join() deadlock
        stop = _threading.Event()

        def _put(q: _queue.Queue, item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except _queue.Full:
                    continue
            return False

        def decoder():
            try:
                it = source.batches(self.ecfg.batch)
                while True:
                    t0 = time.perf_counter()
                    try:
                        item = next(it)
                    except StopIteration:
                        break
                    legs["decode"] += time.perf_counter() - t0
                    if not _put(decode_q, item):
                        return
            except BaseException as e:  # surface decode failures in main
                errors.append(e)
            finally:
                _put(decode_q, None)

        def uploader():
            prev_last: Optional[np.ndarray] = None
            try:
                while not stop.is_set():
                    try:
                        item = decode_q.get(timeout=0.1)
                    except _queue.Empty:
                        continue
                    if item is None:
                        break
                    ids, frames, n_valid = item
                    t0 = time.perf_counter()
                    fr_dev = jax.device_put(frames)
                    prev_dev = None
                    if self.cfg.inspect.quality_stats:
                        # previous batch's last frame -> cross-batch motion
                        # diff (first batch diffs frame 0 against itself,
                        # like the reference, infer_video.py:101-104)
                        prev = frames[:1] if prev_last is None else prev_last
                        prev_dev = jax.device_put(prev)
                        prev_last = frames[n_valid - 1:n_valid].copy()
                    legs["upload"] += time.perf_counter() - t0
                    if not _put(upload_q, (ids, frames, n_valid, fr_dev,
                                           prev_dev)):
                        return
            except BaseException as e:
                errors.append(e)
            finally:
                _put(upload_q, None)

        # 4th stage: sink thread runs _consume (blocking download drain +
        # overlay/write/events) off the main thread, so the main thread's
        # steady-state cost is dispatch + starting async copies (~0) and the
        # pipeline bound drops to max(decode, upload, host) per frame
        consume_q: _queue.Queue = _queue.Queue(
            maxsize=max(self.ecfg.max_in_flight, 1))

        def sink():
            try:
                while True:
                    try:
                        item = consume_q.get(timeout=0.1)
                    except _queue.Empty:
                        if stop.is_set():
                            return
                        continue
                    if item is None:
                        return
                    ids_b, frames_b, n_valid_b, out_b, t_dispatch = item
                    self._consume(ids_b, frames_b, n_valid_b, out_b, state)
                    # per-batch latency: dispatch entry -> results consumed
                    # (device step + D->H + overlay/write/events); a real-time
                    # product is specified by this, not just throughput
                    state["batch_lat_ms"].append(
                        (time.perf_counter() - t_dispatch) * 1000.0)
            except BaseException as e:
                errors.append(e)
                stop.set()  # unwedge producers; main loop checks `errors`

        threads = [_threading.Thread(target=decoder, daemon=True),
                   _threading.Thread(target=uploader, daemon=True)]
        for t in threads:
            t.start()
        sink_t = _threading.Thread(target=sink, daemon=True)
        sink_t.start()

        try:
            while not errors:
                item = upload_q.get()
                if item is None:
                    break
                ids, frames, n_valid, fr_dev, prev_dev = item
                t0 = time.perf_counter()
                if prev_dev is not None:
                    out = self.step(self.variables, fr_dev,
                                    prev_frame_bgr=prev_dev)
                else:
                    out = self.step(self.variables, fr_dev)
                self._start_download(out)
                legs["dispatch"] += time.perf_counter() - t0
                if not _put(consume_q, (ids, frames, n_valid, out, t0)):
                    break
            _put(consume_q, None)
            sink_t.join()  # drain the in-flight batches
        finally:
            stop.set()  # unblocks any producer still waiting on a full queue
            for t in threads + [sink_t]:
                t.join(timeout=10.0)
        if errors:
            raise errors[0]

        if state["writer"] is not None:
            state["writer"].close()

        with open(out_dir / "events.csv", "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["frame_id", "cable_pct", "tape_pct", "burr_pct",
                         "burr_px", "status"])
            wr.writerows(state["csv_rows"])
        if self.quality_gate is not None:
            with open(out_dir / "skipped.csv", "w", newline="") as f:
                wr = csv.writer(f)
                wr.writerow(["frame_id", "reason", "lap_var", "gray_std", "mad"])
                wr.writerows(state["skipped"])
        if self.event_detector is not None:
            with open(out_dir / "detector_events.csv", "w", newline="") as f:
                wr = csv.writer(f)
                wr.writerow(["frame_id", "event_type"])
                wr.writerows(state["detector_events"])
        if self.event_gate is not None:
            with open(out_dir / "gated_events.csv", "w", newline="") as f:
                wr = csv.writer(f)
                wr.writerow(["frame_id", "event_type", "ratio", "has_burr"])
                wr.writerows(state["gated_events"])
        if self.tracker is not None:
            with open(out_dir / "confirmed_defects.csv", "w", newline="") as f:
                wr = csv.writer(f)
                wr.writerow(["defect_id", "type", "class_id", "start_frame",
                             "duration", "area", "confidence"])
                for c in state["confirmed_defects"]:
                    wr.writerow([c["defect_id"], c["type"], c["class_id"],
                                 c["start_frame"], c["duration"], c["area"],
                                 f"{c['confidence']:.2f}"])

        elapsed = time.time() - state["t0"]
        n = max(state["processed"], 1)
        legs_ms = {k: round(v * 1000 / n, 3) for k, v in state["legs"].items()}
        # with all four pipeline stages overlapped, steady-state throughput
        # is bound by the slowest stage (decode | upload | main-thread
        # dispatch | sink download+host); 'download' includes waiting out any
        # device compute + D->H copy not yet drained when the sink gets the
        # batch, so this is the e2e projection incl. the device step
        bottleneck = max(legs_ms["decode"], legs_ms["upload"],
                         legs_ms["dispatch"],
                         legs_ms["download"] + legs_ms["host"])
        lat = sorted(state["batch_lat_ms"])
        batch_latency = None
        if lat:
            batch_latency = {
                "batch": self.ecfg.batch,
                "p50": round(lat[len(lat) // 2], 1),
                "p99": round(lat[min(len(lat) - 1,
                                     int(len(lat) * 0.99))], 1),
                "max": round(lat[-1], 1)}
        summary = {
            "processed": state["processed"],
            "elapsed_sec": round(elapsed, 2),
            "fps": round(state["processed"] / elapsed, 2) if elapsed > 0 else 0.0,
            "legs_ms_per_frame": legs_ms,
            "pipelined_fps_bound": round(1000.0 / bottleneck, 2)
            if bottleneck > 0 else None,
            # per-batch dispatch->consumed latency percentiles (ms):
            # a real-time inspection product is specified by latency AND
            # throughput (reference loop was frame-serial so its latency
            # equaled 1/FPS; here batches pipeline, so they differ)
            "batch_latency_ms": batch_latency,
            "burr_frames": state["burr_frames"],
            "skipped_frames": len(state["skipped"]),
            "detector_events": len(state["detector_events"]),
            "gated_events": len(state["gated_events"]),
            "confirmed_defects": len(state["confirmed_defects"]),
            "wrap_events": len(state["wrap_events"]),
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
