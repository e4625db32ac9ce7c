"""Multi-stream batched serving: N video/camera streams through one fused
device step.

The reference processes one stream sequentially (SURVEY §2.2 'Multi-stream
batched inference' is listed as a missing TPU-native capability; BASELINE
config 5 asks for batch >= 8 streams). Here reader threads decode each stream
into per-stream queues; the serving loop assembles mixed batches (one slot
per stream round-robin), runs the jitted pipeline step (optionally sharded
over the mesh data axis), and demuxes FrameOutputs back to per-stream
callbacks.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from unet_tpu.pipeline import stages
from unet_tpu.pipeline.config import PipelineCfg


@dataclass
class StreamResult:
    stream_id: int
    frame_id: int
    cable_px: int
    tape_px: int
    burr_px: int
    class_map: Optional[np.ndarray] = None


class MultiStreamServer:
    def __init__(self, model, variables, cfg: PipelineCfg,
                 mesh=None, return_class_map: bool = False,
                 queue_depth: int = 8):
        self.variables = variables
        self.cfg = cfg
        self.return_class_map = return_class_map
        if mesh is not None:
            from unet_tpu import parallel
            step = parallel.shard_pipeline_step(
                lambda v, f: stages.run_pipeline(v, f, model=model, cfg=cfg),
                mesh)
        else:
            step = stages.build_step(model, cfg)
        self.step = step
        self.queue_depth = queue_depth
        self._queues: List[queue.Queue] = []
        self._threads: List[threading.Thread] = []
        self._stop = threading.Event()

    def _reader(self, stream_id: int, source) -> None:
        q = self._queues[stream_id]
        for frame_id, frame in source.frames():
            if self._stop.is_set():
                break
            q.put((frame_id, frame))
        q.put(None)  # exhausted

    def serve(self, sources: Sequence[Any],
              on_result: Callable[[StreamResult], None],
              max_batches: Optional[int] = None) -> Dict[str, Any]:
        """Run until every source is exhausted. `sources` expose .frames()
        (io.video readers / io.camera). Returns summary stats."""
        import jax.numpy as jnp

        n = len(sources)
        self._queues = [queue.Queue(maxsize=self.queue_depth) for _ in range(n)]
        self._threads = [threading.Thread(target=self._reader, args=(i, s),
                                          daemon=True)
                         for i, s in enumerate(sources)]
        for t in self._threads:
            t.start()

        live = [True] * n
        pending: List[Optional[tuple]] = [None] * n
        processed = 0
        batches = 0
        t0 = time.time()
        while any(live):
            # assemble one slot per live stream (repeat last frame if starved)
            slots = []
            metas = []
            for i in range(n):
                if not live[i]:
                    continue
                if pending[i] is None:
                    item = self._queues[i].get()
                    if item is None:
                        live[i] = False
                        continue
                    pending[i] = item
                fid, frame = pending[i]
                pending[i] = None
                slots.append(frame)
                metas.append((i, fid))
            if not slots:
                break
            batch = np.stack(slots)
            out = self.step(self.variables, jnp.asarray(batch))
            cable = np.asarray(out.cable_px)
            tape = np.asarray(out.tape_px)
            burr = np.asarray(out.burr_px)
            cmap = np.asarray(out.class_map) if self.return_class_map else None
            for k, (sid, fid) in enumerate(metas):
                on_result(StreamResult(
                    stream_id=sid, frame_id=fid,
                    cable_px=int(cable[k]), tape_px=int(tape[k]),
                    burr_px=int(burr[k]),
                    class_map=cmap[k] if cmap is not None else None))
                processed += 1
            batches += 1
            if max_batches is not None and batches >= max_batches:
                break
        self._stop.set()
        dt = time.time() - t0
        return {"frames": processed, "batches": batches,
                "elapsed_sec": round(dt, 3),
                "fps": round(processed / dt, 2) if dt > 0 else 0.0}
