"""Live watch: a continuous HTTP view of a running simulation.

The reference's operators watch the GLFW viewer window (viewer.cpp RenderLoop,
:2262-2383). A TPU pod server is headless, so the live view is an HTTP
endpoint instead: `/stream` is a multipart/x-mixed-replace stream of PNG
frames (motion-PNG — rendered by every mainstream browser exactly like MJPEG),
`/frame.png` a single snapshot, and `/` a minimal page embedding the stream.
Frames come from the server's existing offscreen render path at a configured
rate; rendering happens in the HTTP thread, never blocking the physics loop.

stdlib-only (http.server + utils/png.py) — no new dependencies.
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

from mujoco_ros_pkgs_tpu.utils import png
from mujoco_ros_pkgs_tpu.utils.log import get_logger

_log = get_logger("watch")

_PAGE = b"""<!doctype html>
<html><head><title>mujoco_ros_pkgs_tpu live view</title></head>
<body style="margin:0;background:#111;display:grid;place-items:center;height:100vh">
<img src="/stream" style="max-width:100%;max-height:100%"/>
</body></html>
"""

_BOUNDARY = "mrpframe"


class WatchServer:
    """Serve live PNG frames over HTTP.

    frame_fn: () -> (H, W, 3) uint8 RGB array (called at most `fps` times/s;
    one render is shared by all connected clients via a tiny cache)."""

    def __init__(self, frame_fn: Callable[[], np.ndarray], port: int = 0,
                 fps: float = 10.0, host: str = "127.0.0.1"):
        self._frame_fn = frame_fn
        self._fps = max(float(fps), 0.1)
        self._cache: Optional[bytes] = None
        self._cache_t = 0.0
        self._cache_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):   # route to the named logger
                _log.debug("http %s", fmt % args)

            def do_GET(self):
                try:
                    if self.path in ("/", "/index.html"):
                        self.send_response(200)
                        self.send_header("Content-Type", "text/html")
                        self.send_header("Content-Length", str(len(_PAGE)))
                        self.end_headers()
                        self.wfile.write(_PAGE)
                    elif self.path == "/frame.png":
                        data = outer._encoded_frame()
                        self.send_response(200)
                        self.send_header("Content-Type", "image/png")
                        self.send_header("Content-Length", str(len(data)))
                        self.end_headers()
                        self.wfile.write(data)
                    elif self.path == "/stream":
                        self.send_response(200)
                        self.send_header(
                            "Content-Type",
                            f"multipart/x-mixed-replace; boundary={_BOUNDARY}")
                        self.end_headers()
                        period = 1.0 / outer._fps
                        while not outer._stop.is_set():
                            t0 = time.monotonic()
                            data = outer._encoded_frame()
                            self.wfile.write(
                                f"--{_BOUNDARY}\r\nContent-Type: image/png\r\n"
                                f"Content-Length: {len(data)}\r\n\r\n"
                                .encode())
                            self.wfile.write(data)
                            self.wfile.write(b"\r\n")
                            self.wfile.flush()
                            dt = period - (time.monotonic() - t0)
                            if dt > 0:
                                time.sleep(dt)
                    else:
                        self.send_error(404)
                except (BrokenPipeError, ConnectionResetError):
                    pass   # client went away mid-stream

        self._stop = threading.Event()
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        _log.info("live view at http://%s:%d/ (%.1f fps)", host, self.port,
                  self._fps)

    def _encoded_frame(self) -> bytes:
        """PNG-encode at most `fps` times/s; concurrent clients share frames."""
        now = time.monotonic()
        with self._cache_lock:
            if self._cache is not None and (now - self._cache_t) < 1.0 / self._fps:
                return self._cache
            frame = np.asarray(self._frame_fn(), dtype=np.uint8)
            self._cache = png.encode(frame)
            self._cache_t = now
            return self._cache

    def stop(self):
        self._stop.set()
        self._httpd.shutdown()
        self._httpd.server_close()
