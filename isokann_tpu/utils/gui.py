"""Live training dashboard — browser-based equivalent of the reference's
Bonito/WGLMakie GUI (``ext/MakieExt.jl:18-80``).

``serve_dashboard(iso)`` starts a background HTTP server with an
auto-refreshing page showing the training dashboard (and Ramachandran plot
for MD systems); ``livegui(iso, ...)`` additionally runs training in a
background thread so the page updates live.
"""

from __future__ import annotations

import http.server
import io
import threading

_PAGE = """<!doctype html>
<html><head><title>isokann_tpu live dashboard</title>
<meta http-equiv="refresh" content="{refresh}">
<style>body{{font-family:sans-serif;background:#111;color:#eee;text-align:center}}
img{{max-width:95%;background:#fff;margin:8px;border-radius:6px}}</style></head>
<body><h3>isokann_tpu &mdash; live training</h3>
<div>{status}</div>
<img src="/training.png"/><br/>{rama}
</body></html>"""


def _render(iso, want_rama):
    import matplotlib.pyplot as plt
    from .plots import plot_training, scatter_ramachandran

    out = {}
    fig = plot_training(iso)
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=100)
    plt.close(fig)
    out["/training.png"] = buf.getvalue()
    if want_rama:
        try:
            fig = scatter_ramachandran(iso)
            buf = io.BytesIO()
            fig.savefig(buf, format="png", dpi=100)
            plt.close(fig)
            out["/rama.png"] = buf.getvalue()
        except Exception:
            pass
    return out


def serve_dashboard(iso, port: int = 8000, refresh: int = 3):
    """Serve the live dashboard at http://localhost:<port>/ (background
    thread).  Returns the server (call ``.shutdown()`` to stop)."""
    want_rama = iso.data.pdbfile is not None

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                rama = ('<img src="/rama.png"/>' if want_rama else "")
                status = (f"iterations: {len(iso.losses)} | data: "
                          f"{len(iso.data)} | loss: "
                          f"{iso.losses[-1]:.4g}" if iso.losses else "warming up")
                body = _PAGE.format(refresh=refresh, status=status,
                                    rama=rama).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif self.path in ("/training.png", "/rama.png"):
                try:
                    imgs = _render(iso, want_rama)
                    data = imgs.get(self.path, b"")
                except Exception:
                    data = b""
                self.send_response(200 if data else 404)
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(data)
            else:
                self.send_response(404)
                self.end_headers()

    srv = http.server.ThreadingHTTPServer(("0.0.0.0", port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def livegui(iso, iterations: int = 1000, chunk: int = 20, port: int = 8000,
            adaptive_kde: int = 0):
    """Run training in the background while serving the live dashboard
    (the reference GUI's train-while-watching loop, ``ext/MakieExt.jl:42-71``).
    Blocks until training finishes; Ctrl-C to stop early."""
    srv = serve_dashboard(iso, port=port)
    print(f"live dashboard at http://localhost:{port}/")
    try:
        done = 0
        while done < iterations:
            n = min(chunk, iterations - done)
            if adaptive_kde:
                iso.run_kde(generations=1, iter=n, kde=adaptive_kde)
            else:
                iso.run(n)
            done += n
    finally:
        srv.shutdown()
    return iso
