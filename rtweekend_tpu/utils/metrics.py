"""Structured metrics logging (JSON lines).

The reference's only observability is a scanline countdown
(reference src/main.zig:384). Production renders need machine-readable
progress: spp completed, rays/s, per-batch submission timing, device
inventory, loss curves for inverse rendering. Events are newline-
delimited JSON so they pipe straight into jq / a metrics collector.

Timing semantics on the remote-TPU runtime: batches are submitted
asynchronously (the driver never blocks mid-render — a device sync
would wreck dispatch pipelining), so per-batch `wall_s` measures
submission, while the final `render_done` event's rays/s is measured
against real completion (the caller fetches the framebuffer).
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional


class MetricsLogger:
    """Newline-delimited JSON event logger.

    path=None, stream=None -> stderr. Every event carries a monotonic
    `t_s` (seconds since logger creation) and wall-clock `ts`.
    """

    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None):
        self._own = False
        if path is not None:
            self._f = open(path, "a")
            self._own = True
        else:
            self._f = stream if stream is not None else sys.stderr
        self._t0 = time.perf_counter()

    def log(self, event: str, **fields) -> None:
        rec = {
            "event": event,
            "ts": round(time.time(), 3),
            "t_s": round(time.perf_counter() - self._t0, 4),
        }
        rec.update(fields)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._own:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
