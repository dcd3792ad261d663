"""HTTP status surface (SURVEY.md §2.8 O2): the reference embeds Jetty on
port 31081 with `/` (HTML status: binlog file/position, per-op counts,
latency samples — StatusServlet.java:61-104) and `/jmx` (JSON dump of the
MBeans — JmxServlet.java:38-58).

Spark-native, most of this is the Spark UI + StreamingQuery.lastProgress;
this tiny stdlib server exposes the same two endpoints over the engine's own
counter surface (CdcBatchResult rollups + listener progress) for parity and
for scraping in tests/ops. No extra dependencies — http.server on a daemon
thread, JSON via the stdlib.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class StatusServer:
    """Serve `/` (plain-text status) and `/jmx` (JSON counters) for a
    CdcStreamPipeline-like object exposing ``total_counts()``, ``results``
    and optionally a ``listener`` with ``progress``."""

    def __init__(self, pipeline, host: str = "127.0.0.1", port: int = 31081):
        self.pipeline = pipeline
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence per-request stderr noise
                pass

            def _send(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/jmx":
                    self._send(
                        200,
                        json.dumps(outer.snapshot()).encode(),
                        "application/json",
                    )
                elif self.path == "/":
                    snap = outer.snapshot()
                    lines = [
                        f"checkpoint_filename: {snap['checkpoint_filename']}",
                        f"checkpoint_position: {snap['checkpoint_position']}",
                        f"batches: {snap['batches']}",
                        f"dead_letter: {snap['dead_letter']}",
                        "counts:",
                        *[f"  {k}: {v}" for k, v in sorted(snap["counts"].items())],
                        "latency_s (last 10):",
                        *[
                            f"  {k}: avg={sum(v) / len(v):.4f} "
                            f"samples={[round(s, 4) for s in v]}"
                            for k, v in sorted(snap["latency"].items())
                            if v
                        ],
                    ]
                    self._send(200, "\n".join(lines).encode(), "text/plain")
                else:
                    self._send(404, b"not found", "text/plain")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def snapshot(self) -> dict:
        """The /jmx payload: counter rollups in the shape of the reference's
        bean dump (per-`db.table.op` counts + position + batch stats)."""
        results = list(getattr(self.pipeline, "results", []))
        listener = getattr(self.pipeline, "listener", None)
        # the LATEST batch's checkpoint pair, not max(position): binlog
        # positions reset per file, so after a rotate the max is the OLD
        # file's larger offset frozen forever (r13 review) — and a bare
        # position is ambiguous without its filename (the reference's
        # status shows both, StatusServlet.java:61-104)
        latest = next(
            (r for r in reversed(results) if r.checkpoint_position is not None),
            None,
        )
        return {
            "counts": self.pipeline.total_counts(),
            "checkpoint_position": latest.checkpoint_position if latest else None,
            "checkpoint_filename": latest.checkpoint_filename if latest else None,
            "batches": len(results),
            "dead_letter": sum(r.dead_letter_count for r in results),
            "skipped_unmapped": sum(r.skipped_unmapped for r in results),
            # last-10 apply wall-time ring per key (StatusServlet.java:83-99)
            "latency": (
                self.pipeline.latency_samples()
                if hasattr(self.pipeline, "latency_samples")
                else {}
            ),
            "progress": list(getattr(listener, "progress", [])),
        }

    def start(self) -> "StatusServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        # shutdown() waits on an event that only serve_forever's exit sets:
        # calling it before start() (thread never runs serve_forever) blocks
        # the caller forever (r13 review). A started-but-not-yet-serving
        # thread is fine — serve_forever checks the shutdown request on
        # entry and sets the event immediately.
        if self._thread.is_alive():
            self._server.shutdown()
        self._server.server_close()
