"""Host video I/O: batched frame sources feeding the device pipeline.

The reference's sequential `while cap.read()` loop (infer_two_stage_burr.py:269)
becomes a batched iterator so the TPU sees full batches; decode stays on host
(cv2/ffmpeg) and overlaps with device compute via the engine's async dispatch.
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np


@dataclass
class VideoMeta:
    width: int
    height: int
    fps: float
    total_frames: int


class VideoReader:
    """cv2.VideoCapture wrapper with frame-stride batching."""

    def __init__(self, path: str, frame_stride: int = 1, max_frames: Optional[int] = None):
        import cv2
        self.cap = cv2.VideoCapture(str(path))
        if not self.cap.isOpened():
            raise FileNotFoundError(f"cannot open video {path}")
        self.frame_stride = max(int(frame_stride), 1)
        self.max_frames = max_frames
        self.meta = VideoMeta(
            width=int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            fps=float(self.cap.get(cv2.CAP_PROP_FPS) or 25.0),
            total_frames=int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        )

    def frames(self) -> Iterator[Tuple[int, np.ndarray]]:
        """(frame_id, BGR frame) honoring stride / max_frames."""
        fid = 0
        emitted = 0
        try:
            while True:
                ok, frame = self.cap.read()
                if not ok:
                    break
                fid += 1
                if fid % self.frame_stride != 0:
                    continue
                yield fid, frame
                emitted += 1
                if self.max_frames is not None and emitted >= self.max_frames:
                    break
        finally:
            # also runs on GeneratorExit: a consumer abandoning the stream
            # mid-read (serve max_batches early exit, sink failure) must not
            # leave the cv2/ffmpeg capture handle open
            self.cap.release()

    def batches(self, batch: int) -> Iterator[Tuple[List[int], np.ndarray, int]]:
        """Yield (frame_ids, (B, H, W, 3) uint8, n_valid). The final batch is
        padded by repeating its last frame so device shapes stay static."""
        it = self.frames()
        while True:
            chunk = list(itertools.islice(it, batch))
            if not chunk:
                return
            ids = [c[0] for c in chunk]
            frames = [c[1] for c in chunk]
            n_valid = len(frames)
            while len(frames) < batch:
                frames.append(frames[-1])
                ids.append(ids[-1])
            yield ids, np.stack(frames), n_valid


class ImageDirReader:
    """Image-directory source with the same batch interface (the reference's
    process_images path, tools/inspect_tool.py)."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, path: str, max_frames: Optional[int] = None):
        self.paths = sorted(p for p in Path(path).iterdir()
                            if p.suffix.lower() in self.EXTS)[:max_frames]
        if not self.paths:
            raise FileNotFoundError(f"no images under {path}")
        import cv2
        probe = cv2.imdecode(np.fromfile(str(self.paths[0]), np.uint8), cv2.IMREAD_COLOR)
        self.meta = VideoMeta(width=probe.shape[1], height=probe.shape[0],
                              fps=25.0, total_frames=len(self.paths))

    def frames(self) -> Iterator[Tuple[int, np.ndarray]]:
        import cv2
        warned = False
        for i, p in enumerate(self.paths):
            # CJK-path-safe read (reference src/data/dataset.py np.fromfile trick)
            img = cv2.imdecode(np.fromfile(str(p), np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                continue
            if img.shape[:2] != (self.meta.height, self.meta.width):
                # batches are stacked into one static-shape device array, so
                # mixed-size dirs are normalized to the first image's size
                if not warned:
                    print(f"note: resizing mixed-size images to "
                          f"{self.meta.width}x{self.meta.height} (first image)")
                    warned = True
                img = cv2.resize(img, (self.meta.width, self.meta.height))
            yield i + 1, img

    def batches(self, batch: int):
        return VideoReader.batches(self, batch)  # type: ignore[arg-type]


class VideoWriter:
    """cv2.VideoWriter wrapper (mp4v), lazily opened on first frame."""

    def __init__(self, path: str, fps: float):
        self.path = str(path)
        self.fps = fps
        self.writer = None

    def write(self, frame_bgr: np.ndarray) -> None:
        import cv2
        if self.writer is None:
            Path(self.path).parent.mkdir(parents=True, exist_ok=True)
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            h, w = frame_bgr.shape[:2]
            self.writer = cv2.VideoWriter(self.path, fourcc, self.fps, (w, h))
        self.writer.write(frame_bgr)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.release()
            self.writer = None
