"""Browser-based live view of a progressive render.

The TPU-native replacement for the reference's GL display path
(Nexus/src/OpenGL/PixelBuffer.cpp + Renderer display loop): the CLI
renderer rewrites its PNG every N samples (`--progressive N`,
apps/render.py) and this stdlib HTTP server serves that file behind an
auto-refreshing page — "live progressive display" without a GPU
windowing stack, viewable through any port-forward.

Usage:
  python -m nexus_tpu.apps.render scene.glb --out /tmp/r.png \
      --progressive 4 --spp 256 &
  python -m nexus_tpu.apps.viewer /tmp/r.png --port 8000
  # open http://localhost:8000
"""

from __future__ import annotations

import argparse
import http.server
from pathlib import Path

PAGE = """<!doctype html>
<html><head><title>nexus_tpu live render</title>
<style>body{{background:#111;color:#ccc;font-family:monospace;
text-align:center}}img{{image-rendering:pixelated;max-width:95vw;
max-height:90vh;margin-top:1em}}</style></head>
<body><div id="s">loading…</div>
<img id="im" src="/image?t=0">
<script>
let n = 0;
setInterval(() => {{
  n += 1;
  const im = document.getElementById("im");
  const probe = new Image();
  probe.onload = () => {{ im.src = probe.src;
    document.getElementById("s").textContent =
      "refresh #" + n + " — " + new Date().toLocaleTimeString(); }};
  probe.src = "/image?t=" + Date.now();
}}, {interval});
</script></body></html>
"""


class _Handler(http.server.BaseHTTPRequestHandler):
    png_path: Path = Path("render.png")
    interval_ms: int = 1000

    def do_GET(self):  # noqa: N802 (stdlib API name)
        if self.path.startswith("/image"):
            try:
                data = self.png_path.read_bytes()
            except OSError:
                self.send_error(404, "render not written yet")
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Cache-Control", "no-store")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        body = PAGE.format(interval=self.interval_ms).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet
        pass


def make_server(png_path, port=0) -> http.server.HTTPServer:
    """Bound-but-not-serving HTTP server (port 0 = ephemeral)."""
    _Handler.png_path = Path(png_path)
    return http.server.HTTPServer(("127.0.0.1", port), _Handler)


def serve(png_path, port=8000, interval_ms=1000):
    _Handler.interval_ms = interval_ms
    with make_server(png_path, port) as srv:
        print(f"viewing {png_path} at http://127.0.0.1:{srv.server_port}")
        srv.serve_forever()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nexus_tpu.apps.viewer")
    ap.add_argument("png", help="PNG being rewritten by the renderer")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--interval", type=int, default=1000,
                    help="browser refresh period (ms)")
    args = ap.parse_args(argv)
    serve(args.png, args.port, args.interval)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
