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


# 3-D molecule panel (reference ``plotmol``, ext/MakieExt.jl:209-310):
# frames + bonds + per-frame chi served as JSON, rendered by a
# dependency-free canvas viewer (drag-rotate, frame slider, chi color).
_MOL_PAGE = """<!doctype html>
<html><head><title>isokann_tpu molecule</title>
<style>body{font-family:sans-serif;background:#111;color:#eee;text-align:center}
canvas{background:#181818;border-radius:6px;margin:8px}</style></head>
<body><h3>molecule &mdash; frames colored by &chi;</h3>
<canvas id="cv" width="720" height="540"></canvas><br/>
frame <input type="range" id="fr" min="0" value="0" style="width:420px"/>
<span id="lbl"></span>
<script>
let D=null,R=[[1,0,0],[0,1,0],[0,0,1]],drag=null;
const cv=document.getElementById('cv'),ctx=cv.getContext('2d');
const fr=document.getElementById('fr'),lbl=document.getElementById('lbl');
function mul(a,b){let c=[[0,0,0],[0,0,0],[0,0,0]];
 for(let i=0;i<3;i++)for(let j=0;j<3;j++)for(let k=0;k<3;k++)
  c[i][j]+=a[i][k]*b[k][j];return c;}
function rot(ax,ay){const ca=Math.cos(ax),sa=Math.sin(ax),
 cb=Math.cos(ay),sb=Math.sin(ay);
 return mul([[1,0,0],[0,ca,-sa],[0,sa,ca]],[[cb,0,sb],[0,1,0],[-sb,0,cb]]);}
function chicolor(t){t=Math.max(0,Math.min(1,t));
 const r=Math.round(60+195*t),g=Math.round(60+80*(1-Math.abs(t-0.5)*2)),
 b=Math.round(60+195*(1-t));return `rgb(${r},${g},${b})`;}
function draw(){if(!D)return;const f=+fr.value,X=D.frames[f],n=X.length;
 ctx.clearRect(0,0,cv.width,cv.height);
 let c=[0,0,0];for(const p of X){c[0]+=p[0]/n;c[1]+=p[1]/n;c[2]+=p[2]/n;}
 let s=0;for(const p of X)s=Math.max(s,Math.hypot(p[0]-c[0],p[1]-c[1],p[2]-c[2]));
 const sc=0.45*Math.min(cv.width,cv.height)/(s+1e-9);
 const pr=p=>{const q=[p[0]-c[0],p[1]-c[1],p[2]-c[2]];
  return [cv.width/2+sc*(R[0][0]*q[0]+R[0][1]*q[1]+R[0][2]*q[2]),
          cv.height/2-sc*(R[1][0]*q[0]+R[1][1]*q[1]+R[1][2]*q[2]),
          R[2][0]*q[0]+R[2][1]*q[1]+R[2][2]*q[2]];};
 const P=X.map(pr),chi=D.chi[f],col=chicolor(D.chi_lo>=D.chi_hi?0.5:
   (chi-D.chi_lo)/(D.chi_hi-D.chi_lo));
 ctx.strokeStyle=col;ctx.lineWidth=3;ctx.lineCap='round';
 for(const[a,b]of D.bonds){ctx.beginPath();ctx.moveTo(P[a][0],P[a][1]);
  ctx.lineTo(P[b][0],P[b][1]);ctx.stroke();}
 for(const p of P){ctx.beginPath();
  ctx.arc(p[0],p[1],Math.max(2,4+p[2]*sc*0.02),0,7);
  ctx.fillStyle=col;ctx.fill();}
 lbl.textContent=` ${f+1}/${D.frames.length}  chi=${chi.toFixed(3)}`;}
cv.onmousedown=e=>drag=[e.clientX,e.clientY];
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{if(!drag)return;
 R=mul(rot((e.clientY-drag[1])*0.01,(e.clientX-drag[0])*0.01),R);
 drag=[e.clientX,e.clientY];draw();};
fr.oninput=draw;
async function load(first){const r=await fetch('/mol.json');D=await r.json();
 fr.max=D.frames.length-1;if(first)fr.value=fr.max;draw();}
load(true);setInterval(()=>load(false),5000);
</script></body></html>"""


def _mol_payload(iso, max_frames: int = 120):
    """Frames + bonds + per-frame chi as a JSON blob for the molecule
    viewer (the reference colors the molecule by the frame's chi value,
    ext/MakieExt.jl:209-245)."""
    import json as _json

    import numpy as np

    X = np.asarray(iso.data.coords, np.float32)
    if X.shape[0] > max_frames:
        X = X[-max_frames:]
    chi = np.asarray(iso.chicoords(X))[:, 0]
    frames = X.reshape(X.shape[0], -1, 3)
    sysobj = getattr(iso.data.sim, "system", None)
    bonds = (np.asarray(sysobj.bond_idx).reshape(-1, 2).tolist()
             if sysobj is not None and getattr(sysobj, "bond_idx", None)
             is not None else [])
    return _json.dumps({
        "frames": np.round(frames, 4).tolist(),
        "bonds": bonds,
        "chi": chi.tolist(),
        "chi_lo": float(chi.min()),
        "chi_hi": float(chi.max()),
    }).encode()


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
                    mol = ('<p><a href="/mol" style="color:#8cf">live 3-D '
                           'molecule (chi-colored)</a></p>'
                           if iso is not None and iso.losses else "")
                    body = _PAGE.format(refresh=refresh,
                                        status=status + form,
                                        rama=(imgs and
                                              '<img src="/rama.png"/>' or "")
                                        + mol)
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
                elif self.path == "/mol":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_MOL_PAGE.encode())
                elif self.path == "/mol.json":
                    data = b""
                    if iso is not None:
                        try:
                            data = _mol_payload(iso)
                        except Exception:
                            data = b""
                    self.send_response(200 if data else 404)
                    self.send_header("Content-Type", "application/json")
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
