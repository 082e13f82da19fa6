"""Live training dashboard — browser-based equivalent of the reference's
Bonito/WGLMakie GUI (``ext/MakieExt.jl:18-80``).

``serve_dashboard(iso)`` starts a background HTTP server with an
auto-refreshing page showing the training dashboard (and Ramachandran plot
for MD systems); ``livegui(iso, ...)`` additionally runs training in a
background thread so the page updates live.
"""

from __future__ import annotations

import html
import http.server
import io
import secrets
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


def serve_dashboard(iso, port: int = 8000, refresh: int = 3,
                    host: str = "127.0.0.1"):
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

    srv = http.server.ThreadingHTTPServer((host, port), Handler)
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


# ==========================================================================
# Interactive control panel (reference GUI sliders, ext/MakieExt.jl:18-80)
# ==========================================================================

_FORM = """<form method="post" action="/control" style="margin:10px">
<input type="hidden" name="token" value="{token}"/>
<fieldset style="display:inline-block;text-align:left;border-color:#444">
<legend>simulation / training</legend>
pdb <input name="pdb" value="{pdb}" size="28"/>
steps <input name="steps" value="{steps}" size="5"/>
temp [K] <input name="temp" value="{temp}" size="5"/><br/>
nx <input name="nx" value="{nx}" size="5"/>
nk <input name="nk" value="{nk}" size="4"/>
opt <select name="opt">
<option value="adam" {sel_adam}>Adam</option>
<option value="nesterov" {sel_nest}>Nesterov</option></select>
lr <input name="lr" value="{lr}" size="8"/>
reg <input name="reg" value="{reg}" size="8"/><br/>
kde/gen <input name="kde" value="{kde}" size="4"/>
<button name="action" value="apply">Apply &amp; restart</button>
<button name="action" value="toggle">{toggle}</button>
</fieldset></form>"""


class InteractiveGui:
    """Browser control panel + live training loop.

    The reference GUI exposes sliders for pdb/steps/temperature/optimizer/
    learning rate/regularization/nx/nk and trains while you watch
    (``ext/MakieExt.jl:18-80``); this is the dependency-free equivalent:
    an HTML form drives (re)construction of the simulation + ``Iso``, a
    background thread runs training chunks (optionally KDE-adaptive), and
    the dashboard images refresh live.
    """

    def __init__(self, pdb=None, steps=100, temp=310.0, nx=64, nk=4,
                 opt="adam", lr=1e-3, reg=1e-4, kde=0, chunk=25):
        self.cfg = dict(pdb=pdb or "", steps=int(steps), temp=float(temp),
                        nx=int(nx), nk=int(nk), opt=opt, lr=float(lr),
                        reg=float(reg), kde=int(kde))
        self.chunk = int(chunk)
        self.running = False
        self.iso = None
        self.lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = None
        # per-session CSRF token: /control posts must echo it, so a
        # hostile web page cannot CSRF the localhost endpoint (which reads
        # arbitrary file paths and launches compute)
        self._token = secrets.token_urlsafe(16)

    # -- model/simulation construction ---------------------------------

    def _build(self):
        from ..iso import Iso
        from ..optim import AdamRegularized, NesterovRegularized
        from ..simulators.mdsim import MDSimulation

        c = self.cfg
        sim = MDSimulation(pdb=c["pdb"] or None, steps=c["steps"],
                           temp=c["temp"])
        opt = (AdamRegularized(c["lr"], c["reg"]) if c["opt"] == "adam"
               else NesterovRegularized(c["lr"], c["reg"]))
        self.iso = Iso(sim=sim, nx=c["nx"], nk=c["nk"], opt=opt)

    def _train_loop(self):
        while not self._stop.is_set():
            if not self.running or self.iso is None:
                self._stop.wait(0.2)
                continue
            iso = self.iso
            try:
                if self.cfg["kde"]:
                    iso.run_kde(generations=1, iter=self.chunk,
                                kde=self.cfg["kde"])
                else:
                    iso.run(self.chunk)
            except Exception as e:       # degenerate targets etc: pause
                print(f"[gui] training paused: {e}")
                self.running = False

    def apply(self, form):
        """Apply a /control form submission."""
        with self.lock:
            for k in self.cfg:
                if k in form:
                    cast = type(self.cfg[k])
                    try:
                        self.cfg[k] = cast(form[k][0])
                    except (TypeError, ValueError):
                        pass
            action = form.get("action", ["apply"])[0]
            if action == "toggle":
                self.running = not self.running and self.iso is not None
            else:
                self.running = False
                self._build()
                self.running = True

    def serve(self, port: int = 8000, refresh: int = 3,
              host: str = "127.0.0.1"):
        # localhost by default: the control endpoint reads arbitrary pdb
        # paths and launches compute — do not expose it to the network
        gui = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                iso = gui.iso
                if self.path in ("/", "/index.html"):
                    # escape config values: they round-trip through the
                    # form and may contain user-supplied paths
                    c = {k: html.escape(str(v), quote=True)
                         for k, v in gui.cfg.items()}
                    form = _FORM.format(
                        token=gui._token,
                        toggle="Pause" if gui.running else "Resume",
                        sel_adam="selected" if gui.cfg["opt"] == "adam" else "",
                        sel_nest="selected" if gui.cfg["opt"] != "adam" else "",
                        **c)
                    status = ("no run yet — configure and Apply" if iso is None
                              else (f"iterations: {len(iso.losses)} | data: "
                                    f"{len(iso.data)} | loss: "
                                    f"{iso.losses[-1]:.4g}" if iso.losses
                                    else "warming up"))
                    imgs = ('<img src="/training.png"/>' if iso is not None
                            and iso.losses else "")
                    body = _PAGE.format(refresh=refresh,
                                        status=status + form,
                                        rama=imgs and
                                        '<img src="/rama.png"/>' or "")
                    body = body.replace('<img src="/training.png"/><br/>',
                                        imgs + "<br/>")
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body.encode())
                elif self.path in ("/training.png", "/rama.png"):
                    data = b""
                    if iso is not None and iso.losses:
                        try:
                            imgs = _render(iso, iso.data.pdbfile is not None)
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

            def do_POST(self):
                import urllib.parse
                length = int(self.headers.get("Content-Length", 0))
                form = urllib.parse.parse_qs(
                    self.rfile.read(length).decode())
                if form.get("token", [""])[0] != gui._token:
                    self.send_response(403)
                    self.end_headers()
                    self.wfile.write(b"bad or missing CSRF token")
                    return
                gui.apply(form)
                self.send_response(303)
                self.send_header("Location", "/")
                self.end_headers()

        srv = http.server.ThreadingHTTPServer((host, port), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        self._worker = threading.Thread(target=self._train_loop, daemon=True)
        self._worker.start()
        self._srv = srv
        return srv

    def shutdown(self):
        self._stop.set()
        self.running = False
        if getattr(self, "_srv", None) is not None:
            self._srv.shutdown()


def interactive_gui(port: int = 8000, **kwargs) -> InteractiveGui:
    """Start the interactive control panel at http://localhost:<port>/
    (reference ``ISOKANN.bonito_gui()`` equivalent)."""
    gui = InteractiveGui(**kwargs)
    gui.serve(port=port)
    print(f"interactive dashboard at http://localhost:{port}/")
    return gui
