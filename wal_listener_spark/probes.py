"""Health-probe surface (W6) — /healthz and /ready over stdlib HTTP.

The reference serves kubernetes probes on ``listener.serverPort``
(``/root/reference/internal/listener/listener.go:107-190``): /healthz
answers while the process runs, /ready once the replication stream is
up. Spark analog: liveness is the driver process; readiness is wired
to the streaming query's progress (``metrics.ProgressListener.alive``
or any callable). Runs in a daemon thread — zero cost to the data
plane.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable


class ProbeServer:
    def __init__(
        self,
        is_ready: Callable[[], bool],
        is_alive: Callable[[], bool] = lambda: True,
        port: int = 0,
    ):
        self._ready = is_ready
        self._alive = is_alive
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (http.server API)
                if self.path == "/healthz":
                    ok = outer._alive()
                elif self.path == "/ready":
                    ok = outer._alive() and outer._ready()
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200 if ok else 503)
                self.end_headers()
                self.wfile.write(b"ok" if ok else b"unavailable")

            def log_message(self, *a):  # quiet
                pass

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def start(self) -> "ProbeServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
