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
from collections import deque
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
    # filled when the pipeline has geometry enabled (wrap-uniformity serving)
    dc_px: Optional[float] = None
    dt_px: Optional[float] = None


class MultiStreamServer:
    """Batch size is FIXED at len(sources) for the whole serve() call: slots
    of exhausted or starved streams are padded with that stream's last frame
    (zeros before its first) and their outputs discarded, so the jitted step
    compiles exactly once. A starved stream delays its slot by at most
    `starvation_timeout` seconds per batch; it never stalls the batch."""

    def __init__(self, model, variables, cfg: PipelineCfg,
                 mesh=None, return_class_map: bool = False,
                 queue_depth: int = 8, starvation_timeout: float = 0.02,
                 max_in_flight: int = 2):
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
        self.starvation_timeout = starvation_timeout
        # dispatched-but-unconsumed device batches: JAX dispatch is async, so
        # keeping a couple of batches in flight overlaps host batch assembly
        # with device compute instead of syncing after every dispatch
        self.max_in_flight = max(int(max_in_flight), 1)
        self._queues: List[queue.Queue] = []
        self._threads: List[threading.Thread] = []
        self._stop = threading.Event()

    def _put(self, q: queue.Queue, item) -> bool:
        """Stop-aware put: a reader must never wedge on a full queue after
        the serving loop exits (max_batches early exit, on_result exception)
        — that would leak the thread and its open source forever."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _reader(self, stream_id: int, source) -> None:
        q = self._queues[stream_id]
        for frame_id, frame in source.frames():
            if self._stop.is_set() or not self._put(q, (frame_id, frame)):
                break
        self._put(q, None)  # exhausted

    def serve(self, sources: Sequence[Any],
              on_result: Callable[[StreamResult], None],
              max_batches: Optional[int] = None) -> Dict[str, Any]:
        """Run until every source is exhausted. `sources` expose .frames()
        (io.video readers / io.camera). Returns summary stats."""
        import jax.numpy as jnp

        n = len(sources)
        self._stop.clear()  # serve() is reusable (e.g. warmup then measure)
        self._queues = [queue.Queue(maxsize=self.queue_depth) for _ in range(n)]
        self._threads = [threading.Thread(target=self._reader, args=(i, s),
                                          daemon=True)
                         for i, s in enumerate(sources)]
        for t in self._threads:
            t.start()

        live = [True] * n                              # reader still producing
        pending: List[Optional[tuple]] = [None] * n    # fetched, unprocessed
        last: List[Optional[np.ndarray]] = [None] * n  # pad for starved slots
        in_flight: deque = deque()                     # (fresh_meta, out)
        processed = 0
        batches = 0

        def consume(fresh_meta, out) -> None:
            nonlocal processed
            cable = np.asarray(out.cable_px)
            tape = np.asarray(out.tape_px)
            burr = np.asarray(out.burr_px)
            cmap = np.asarray(out.class_map) if self.return_class_map else None
            dc = dt_ = None
            if out.diameters is not None:
                dc = np.asarray(out.diameters.dc_px)
                dt_ = np.asarray(out.diameters.dt_px)
            for i, fid in fresh_meta:  # padded slots' outputs are masked out
                on_result(StreamResult(
                    stream_id=i, frame_id=fid,
                    cable_px=int(cable[i]), tape_px=int(tape[i]),
                    burr_px=int(burr[i]),
                    class_map=cmap[i] if cmap is not None else None,
                    dc_px=None if dc is None else float(dc[i]),
                    dt_px=None if dt_ is None else float(dt_[i])))
                processed += 1

        t0 = time.time()
        try:
            while True:
                # fetch at most one frame per stream; a starved stream gets a
                # bounded wait and is then padded, never blocking the batch
                for i in range(n):
                    if not live[i] or pending[i] is not None:
                        continue
                    try:
                        item = self._queues[i].get(
                            timeout=self.starvation_timeout)
                    except queue.Empty:
                        continue
                    if item is None:
                        live[i] = False
                    else:
                        pending[i] = item
                fresh = [i for i in range(n) if pending[i] is not None]
                if not fresh:
                    if not any(live):
                        break
                    continue  # every live stream starved this round; retry
                # fixed-size batch: slot i always belongs to stream i;
                # non-fresh slots repeat the stream's last frame (zeros
                # before its first)
                template = pending[fresh[0]][1]
                slots = [pending[i][1] if pending[i] is not None
                         else (last[i] if last[i] is not None
                               else np.zeros_like(template))
                         for i in range(n)]
                batch = np.stack(slots)
                out = self.step(self.variables, jnp.asarray(batch))
                fresh_meta = []
                for i in fresh:
                    fid, frame = pending[i]
                    fresh_meta.append((i, fid))
                    last[i] = frame
                    pending[i] = None
                # async dispatch: results are consumed max_in_flight batches
                # behind submission so device compute overlaps batch assembly
                in_flight.append((fresh_meta, out))
                if len(in_flight) > self.max_in_flight:
                    consume(*in_flight.popleft())
                batches += 1
                if max_batches is not None and batches >= max_batches:
                    break
            while in_flight:
                consume(*in_flight.popleft())
        finally:
            # always unwedge + reap the readers — including when on_result
            # raised or max_batches cut the loop short mid-stream
            self._stop.set()
            for t in self._threads:
                t.join(timeout=10.0)
        dt = time.time() - t0
        return {"frames": processed, "batches": batches,
                "elapsed_sec": round(dt, 3),
                "fps": round(processed / dt, 2) if dt > 0 else 0.0}
