"""Throughput/ETA progress logging (reference analog: dsiutils ProgressLogger,
used by every long-running operation, e.g. BVGraph.java:2267-2274)."""

from __future__ import annotations

import logging
import time

_logger = logging.getLogger("webgraph_tpu")


class ProgressLogger:
    def __init__(self, items_name: str = "items", log_interval: float = 10.0, logger=None):
        self.items_name = items_name
        self.log_interval = log_interval
        self.logger = logger or _logger
        self.count = 0
        self.expected_updates: int | None = None
        self._start = None
        self._last_log = 0.0

    def start(self, message: str = "") -> None:
        self._start = time.time()
        self._last_log = self._start
        self.count = 0
        if message:
            self.logger.info(message)

    def update(self, delta: int = 1) -> None:
        self.count += delta
        now = time.time()
        if now - self._last_log >= self.log_interval:
            self._last_log = now
            rate = self.count / max(now - self._start, 1e-9)
            eta = ""
            if self.expected_updates:
                remaining = (self.expected_updates - self.count) / max(rate, 1e-9)
                eta = f"; ETA {remaining:.0f}s"
            self.logger.info(f"{self.count} {self.items_name}, {rate:.0f} {self.items_name}/s{eta}")

    light_update = update

    def done(self) -> None:
        if self._start is None:
            return
        elapsed = time.time() - self._start
        rate = self.count / max(elapsed, 1e-9)
        self.logger.info(
            f"Completed {self.count} {self.items_name} in {elapsed:.1f}s ({rate:.0f} {self.items_name}/s)"
        )
