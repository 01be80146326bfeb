"""Interactive scene editor: live progressive render + edit panels.

The TPU-native analog of the reference's interactive edit loop —
SceneHierarchyPanel (instance tree, full TRS + per-material property
editors, Nexus/src/Renderer/Panels/SceneHierarchyPanel.cpp:117-212) and
MetricsPanel (camera + render-settings editors, MetricsPanel.cpp:62-85)
driving Scene invalidation and accumulation restart
(Nexus/src/Renderer/Renderer.cpp:41-77, Scene.cpp:29-55) — re-expressed
as a browser panel over a headless render loop:

  - a render thread accumulates samples progressively (AccumulateKernel
    running-mean semantics) and serves the live image;
  - the HIERARCHY panel lists every instance with translate, EULER
    ROTATION (XYZ degrees), uniform scale and material binding; an edit
    applies the FUNCTIONAL refit (scene/edit.py set_transform /
    set_material — no rebuild, no recompile) and resets accumulation,
    exactly the reference's invalidate -> update -> ResetFrameNumber
    cycle;
  - the MATERIALS panel edits albedo / roughness / ior / emission /
    intensity / opacity per material live (edit.set_material_params —
    shape-stable, next sample traces the new values; flipping a
    material emissive rebuilds the light tables and recompiles, as
    documented there);
  - the CAMERA panel edits position / look-at / horizontal FOV /
    DEFOCUS ANGLE / FOCUS DISTANCE (the reference's metrics-panel
    camera sliders, MetricsPanel.cpp:62-85), and the page has FLY
    NAVIGATION: WASD moves in the view plane, Q/E down/up, arrow keys
    orbit the look-at point (the reference's WASD+mouse camera,
    Camera.cpp:37-100 / Input.cpp:5-32, as browser keys) — the camera
    is a traced pytree, so every move re-traces nothing and recompiles
    nothing;
  - SAVE SCREENSHOT writes the current tone-mapped frame to a
    timestamped PNG on the server host (Renderer.cpp:183-215);
  - CLICK-TO-PICK: a viewport click traces one camera ray and selects
    the hit instance in the hierarchy panel (the reference's pixel
    query, Renderer.cpp:131-142 / PathTracer.cpp:310-317 — the /pick
    endpoint reuses apps/render.py query_pixel);
  - RENDER SETTINGS edits path length and the MIS toggle (static jit
    arguments — applying them recompiles once, which the panel warns
    about) plus background intensity (traced, free).

Usage:
  python -m nexus_tpu.apps.editor model.glb --port 8008 [--res 256]
  # open http://localhost:8008  (any port-forward works)

Transform edits need instanced scenes (build_instanced); material,
camera and settings edits work on any scene.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

MTYPE_NAMES = {0: "diffuse", 1: "dielectric", 2: "plastic", 3: "conductor"}

PAGE = """<!doctype html><html><head><title>nexus_tpu editor</title>
<style>
 body{background:#14151a;color:#c9cdd6;font-family:monospace;margin:0;
      display:flex;height:100vh}
 #left{flex:1;display:flex;align-items:center;justify-content:center}
 img{image-rendering:pixelated;max-width:58vw;max-height:92vh}
 #panel{width:470px;overflow-y:auto;background:#1b1d24;padding:12px;
        border-left:1px solid #333}
 h3{margin:10px 0 6px;color:#8ab4ff} .inst,.mat,.cam{border:1px solid #333;
   border-radius:6px;padding:8px;margin-bottom:8px}
 input,select{background:#0f1014;color:#c9cdd6;border:1px solid #444;
   width:46px;margin:1px} select{width:150px}
 button{background:#2b3a55;color:#dde;border:none;border-radius:4px;
   padding:3px 10px;margin-top:4px;cursor:pointer}
 #status{color:#7a8;margin-bottom:8px} .warn{color:#ca5}
 label{color:#789}
</style></head><body>
<div id=left><img id=im src="/image?t=0"></div>
<div id=panel><div id=status></div>
<h3>camera</h3><div class=cam id=cam></div>
<h3>render settings</h3><div class=cam id=rset></div>
<h3>materials</h3><div id=mats></div>
<h3>scene hierarchy</h3><div id=list></div></div>
<script>
let built = false;
function num(id){return parseFloat(document.getElementById(id).value)}
async function refresh(){
  const s = await (await fetch('/state')).json();
  document.getElementById('status').textContent =
    s.samples + ' spp · ' + s.ms_per_sample.toFixed(0) + ' ms/sample';
  if (built) return;
  built = true;
  const cam = document.getElementById('cam');
  cam.innerHTML = `pos <input id=cpx value=${s.camera.pos[0]}>
    <input id=cpy value=${s.camera.pos[1]}>
    <input id=cpz value=${s.camera.pos[2]}><br>
    look <input id=clx value=${s.camera.look[0]}>
    <input id=cly value=${s.camera.look[1]}>
    <input id=clz value=${s.camera.look[2]}>
    fov <input id=cfov value=${s.camera.fov}><br>
    defocus° <input id=cdef value=${s.camera.defocus||0}>
    focus <input id=cfoc value=${s.camera.focus||0}>
    <label>(0=auto)</label>
    <button onclick=applyCam()>apply</button>
    <span class=warn>(traced: no recompile)</span>`;
  const rs = document.getElementById('rset');
  rs.innerHTML = `bounces <input id=rb value=${s.settings.bounces}>
    MIS <input type=checkbox id=rmis ${s.settings.mis?'checked':''}
         style="width:auto">
    bg <input id=rbg value=${s.settings.bg}>
    <button onclick=applySettings()>apply</button>
    <span class=warn>(bounces/MIS recompile once)</span><br>
    <button onclick=shot()>save screenshot</button>
    <span id=shotpath></span>`;
  const mats = document.getElementById('mats');
  for (const m of s.material_props) {
    const d = document.createElement('div'); d.className='mat';
    d.innerHTML = `<b>#${m.id} ${m.name}</b><br>
      albedo <input id=al0_${m.id} value=${m.albedo[0]}>
      <input id=al1_${m.id} value=${m.albedo[1]}>
      <input id=al2_${m.id} value=${m.albedo[2]}>
      rough <input id=ro_${m.id} value=${m.roughness}>
      ior <input id=io_${m.id} value=${m.ior}><br>
      emis <input id=em0_${m.id} value=${m.emission[0]}>
      <input id=em1_${m.id} value=${m.emission[1]}>
      <input id=em2_${m.id} value=${m.emission[2]}>
      int <input id=in_${m.id} value=${m.intensity}>
      op <input id=op_${m.id} value=${m.opacity}>
      <button onclick=applyMat(${m.id})>apply</button>`;
    mats.appendChild(d);
  }
  const list = document.getElementById('list');
  for (const inst of s.instances) {
    const d = document.createElement('div'); d.className = 'inst';
    d.id = 'instdiv' + inst.id;
    d.innerHTML = `<b>#${inst.id} ${inst.name}</b><br>
      t <input id=tx${inst.id} value=${inst.t[0]}>
        <input id=ty${inst.id} value=${inst.t[1]}>
        <input id=tz${inst.id} value=${inst.t[2]}>
      s <input id=s${inst.id} value=${inst.s}><br>
      r° <input id=rx${inst.id} value=${inst.r[0]}>
        <input id=ry${inst.id} value=${inst.r[1]}>
        <input id=rz${inst.id} value=${inst.r[2]}>
      mat <select id=m${inst.id}>${s.material_props.map(m=>
        `<option value=${m.id} ${m.id==inst.mat?'selected':''}>${m.id}: ${m.name}</option>`).join('')}
      </select>
      <button onclick=apply(${inst.id})>apply</button>`;
    list.appendChild(d);
  }
}
async function apply(i){
  const q = new URLSearchParams({inst:i, tx:num('tx'+i), ty:num('ty'+i),
    tz:num('tz'+i), s:num('s'+i), rx:num('rx'+i), ry:num('ry'+i),
    rz:num('rz'+i), mat:document.getElementById('m'+i).value});
  await fetch('/edit?'+q.toString(), {method:'POST'});
}
async function applyCam(){
  const q = new URLSearchParams({px:num('cpx'),py:num('cpy'),pz:num('cpz'),
    lx:num('clx'),ly:num('cly'),lz:num('clz'),fov:num('cfov'),
    defocus:num('cdef')||0,focus:num('cfoc')||0});
  await fetch('/edit_camera?'+q.toString(), {method:'POST'});
}
async function shot(){
  const r = await (await fetch('/screenshot', {method:'POST'})).json();
  document.getElementById('shotpath').textContent = r.path || r.error;
}
async function applyMat(i){
  const q = new URLSearchParams({mat:i,
    al0:num('al0_'+i),al1:num('al1_'+i),al2:num('al2_'+i),
    ro:num('ro_'+i),io:num('io_'+i),
    em0:num('em0_'+i),em1:num('em1_'+i),em2:num('em2_'+i),
    inten:num('in_'+i),op:num('op_'+i)});
  await fetch('/edit_material?'+q.toString(), {method:'POST'});
}
async function applySettings(){
  const q = new URLSearchParams({bounces:num('rb'),
    mis:document.getElementById('rmis').checked?1:0, bg:num('rbg')});
  await fetch('/edit_settings?'+q.toString(), {method:'POST'});
}
// Click-to-pick (the reference's pixel query, Renderer.cpp:131-142 /
// PathTracer.cpp:310-317): a viewport click traces one camera ray and
// selects the hit instance in the hierarchy panel.
document.getElementById('im').addEventListener('click', async (ev)=>{
  const im = ev.target, r = im.getBoundingClientRect();
  const x = Math.floor((ev.clientX - r.left) / r.width * im.naturalWidth);
  const y = Math.floor((ev.clientY - r.top) / r.height * im.naturalHeight);
  const p = await (await fetch(`/pick?x=${x}&y=${y}`)).json();
  document.querySelectorAll('.inst').forEach(d=>d.style.borderColor='#333');
  if (p.hit) {
    document.getElementById('status').textContent =
      `picked inst #${p.instance} mat #${p.material} t=${p.t.toFixed(3)}`;
    const d = document.getElementById('instdiv' + p.instance);
    if (d) { d.style.borderColor = '#8ab4ff';
             d.scrollIntoView({block:'nearest'}); }
  } else {
    document.getElementById('status').textContent =
      `pick (${x},${y}): miss`;
  }
});
// Fly camera (the reference's WASD navigation, Camera.cpp:37-100):
// WASD moves in the view plane, Q/E down/up, arrows orbit the look-at
// point. Each keypress updates the fields and applies immediately
// (camera is a traced pytree — edits never recompile).
document.addEventListener('keydown', (ev)=>{
  if (ev.target.tagName === 'INPUT') return;
  const P=[num('cpx'),num('cpy'),num('cpz')];
  const L=[num('clx'),num('cly'),num('clz')];
  let f=[L[0]-P[0],L[1]-P[1],L[2]-P[2]];
  const fl=Math.hypot(...f); f=f.map(x=>x/fl);
  const up=[0,1,0];
  let r=[f[1]*up[2]-f[2]*up[1], f[2]*up[0]-f[0]*up[2], f[0]*up[1]-f[1]*up[0]];
  const rl=Math.hypot(...r)||1; r=r.map(x=>x/rl);
  const step=0.25*Math.max(fl,1), rot=0.12;
  let dP=[0,0,0], dL=[0,0,0];
  switch(ev.key){
    case 'w': dP=f.map(x=>x*step); dL=dP; break;
    case 's': dP=f.map(x=>-x*step); dL=dP; break;
    case 'a': dP=r.map(x=>-x*step); dL=dP; break;
    case 'd': dP=r.map(x=>x*step); dL=dP; break;
    case 'q': dP=[0,-step,0]; dL=dP; break;
    case 'e': dP=[0,step,0]; dL=dP; break;
    case 'ArrowLeft':  dP=r.map(x=>-x*fl*rot); break;
    case 'ArrowRight': dP=r.map(x=> x*fl*rot); break;
    case 'ArrowUp':    dP=[0, fl*rot,0]; break;
    case 'ArrowDown':  dP=[0,-fl*rot,0]; break;
    default: return;
  }
  const ids=['cpx','cpy','cpz','clx','cly','clz'];
  const vals=[P[0]+dP[0],P[1]+dP[1],P[2]+dP[2],
              L[0]+dL[0],L[1]+dL[1],L[2]+dL[2]];
  ids.forEach((id,i)=>document.getElementById(id).value=
              Math.round(vals[i]*1000)/1000);
  applyCam();
});
setInterval(()=>{
  const im=document.getElementById('im');
  const p=new Image(); p.onload=()=>{im.src=p.src};
  p.src='/image?t='+Date.now(); refresh();
}, 1000);
refresh();
</script></body></html>"""


def _euler_affine(t, r_deg, s):
    """T * Rz*Ry*Rx * S affine (SceneHierarchyPanel TRS order)."""
    rx, ry, rz = [np.deg2rad(a) for a in r_deg]
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = (Rz @ Ry @ Rx * s).astype(np.float32)
    m[:3, 3] = t
    return m


class EditorState:
    """Shared state between the render loop and the HTTP handlers."""

    def __init__(self, scene, settings, inst_meta, cam_meta):
        self.lock = threading.Lock()
        # Serializes whole read-compute-write edit transactions: with
        # ThreadingHTTPServer two concurrent edits could each snapshot
        # self.scene, compute, and write back — the later write
        # silently discarding the earlier edit. self.lock alone only
        # protected the individual reads/writes.
        self.edit_lock = threading.Lock()
        self.scene = scene
        self.settings = settings
        self.inst_meta = inst_meta      # [{id, name, t, r, s, mat}]
        self.cam_meta = cam_meta        # {pos, look, fov}
        self.acc = None
        self.samples = 0
        self.epoch = 0                  # bumped by edits
        self.ms_per_sample = 0.0
        self.png = b""
        self.stop = False               # set by /quit: clean shutdown
        self.server = None              # ThreadingHTTPServer backref

    def _material_props(self):
        m = self.scene.materials
        mt = np.asarray(m.mtype)
        al = np.asarray(m.albedo)
        em = np.asarray(m.emission)
        r3 = lambda v: [round(float(x), 3) for x in v]
        return [{
            "id": i, "name": MTYPE_NAMES.get(int(mt[i]), f"type{mt[i]}"),
            "albedo": r3(al[i]), "roughness": round(float(np.asarray(m.roughness)[i]), 3),
            "ior": round(float(np.asarray(m.ior)[i]), 3),
            "emission": r3(em[i]),
            "intensity": round(float(np.asarray(m.intensity)[i]), 3),
            "opacity": round(float(np.asarray(m.opacity)[i]), 3),
        } for i in range(m.count)]

    def snapshot_state(self):
        with self.lock:
            st = self.settings
            return {
                "samples": self.samples,
                "ms_per_sample": self.ms_per_sample,
                "instances": self.inst_meta,
                "camera": self.cam_meta,
                "settings": {"bounces": st.path_length,
                             "mis": st.use_mis,
                             "bg": round(float(np.asarray(
                                 self.scene.background_intensity)), 3)},
                "material_props": self._material_props(),
            }

    def apply_edit(self, inst, tx, ty, tz, s, rx, ry, rz, mat):
        from nexus_tpu.scene import edit as edit_mod

        m = _euler_affine((tx, ty, tz), (rx, ry, rz), s)
        with self.edit_lock:            # one edit transaction at a time
            with self.lock:
                scene = self.scene
            scene = edit_mod.set_transform(scene, inst, m)
            if mat != self.inst_meta[inst]["mat"]:
                scene = edit_mod.set_material(scene, inst, mat)
            with self.lock:
                self.scene = scene
                self.inst_meta[inst].update(t=[tx, ty, tz],
                                            r=[rx, ry, rz], s=s, mat=mat)
                self.epoch += 1         # invalidation: restart accumulation

    def apply_camera(self, px, py, pz, lx, ly, lz, fov,
                     defocus=0.0, focus=0.0):
        """Camera edit incl. defocus angle (degrees) and focus distance
        (0 = auto: |look_at - position|) — the reference's metrics-panel
        camera controls (MetricsPanel.cpp:62-85)."""
        from nexus_tpu.scene.camera import make_camera

        with self.edit_lock:
            with self.lock:
                w, h = self.settings.width, self.settings.height
            cam = make_camera(position=(px, py, pz), look_at=(lx, ly, lz),
                              hfov_deg=fov, width=w, height=h,
                              focus_dist=focus if focus > 0 else None,
                              defocus_angle_deg=defocus)
            with self.lock:
                self.scene = self.scene.replace(camera=cam)
                self.cam_meta = {"pos": [px, py, pz],
                                 "look": [lx, ly, lz], "fov": fov,
                                 "defocus": defocus, "focus": focus}
                self.epoch += 1

    def save_screenshot(self, directory="."):
        """Write the current accumulated frame to disk as PNG
        (Renderer.cpp:183-215 SaveScreenshot semantics: tone-mapped
        display image, timestamped filename). Returns the path."""
        import os
        import time as _t

        with self.lock:
            png, samples = self.png, self.samples
        if not png:
            raise RuntimeError("no frame accumulated yet")
        path = os.path.join(
            directory,
            _t.strftime("screenshot_%Y%m%d_%H%M%S") + f"_{samples}spp.png")
        with open(path, "wb") as f:
            f.write(png)
        return path

    def apply_material(self, mat, **props):
        from nexus_tpu.scene import edit as edit_mod

        with self.edit_lock:
            with self.lock:
                scene = self.scene
            scene = edit_mod.set_material_params(scene, mat, **props)
            with self.lock:
                self.scene = scene
                self.epoch += 1

    def pick(self, x, y):
        """Pixel query: trace one center ray through image pixel (x, y)
        and report the hit instance/material/triangle — the reference's
        click-to-pick (Renderer.cpp:131-142, PathTracer.cpp:310-317),
        served to the viewport's click handler."""
        from nexus_tpu.apps.render import query_pixel

        with self.lock:
            scene = self.scene
        return query_pixel(scene, x, y)

    def apply_settings(self, bounces, mis, bg):
        import dataclasses

        import jax.numpy as jnp

        # edit_lock: scene writes must serialize with the other edit
        # transactions — apply_edit's read-compute-write would otherwise
        # clobber the background_intensity replace below.
        with self.edit_lock, self.lock:
            self.settings = dataclasses.replace(
                self.settings, path_length=int(bounces),
                use_mis=bool(mis))
            self.scene = self.scene.replace(
                background_intensity=jnp.asarray(bg, jnp.float32))
            self.epoch += 1


def _render_loop(st: EditorState, batch: int):
    """Progressive accumulation; restarts on epoch change
    (ResetFrameNumber semantics, Renderer.cpp:52-56). Settings edits
    swap the jitted function (one recompile per distinct settings)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from nexus_tpu.core.tonemap import to_display
    from nexus_tpu.render.wavefront import render_pixels

    from collections import OrderedDict

    fns = OrderedDict()     # small LRU: stale settings are rarely
    #                         revisited, and each cached executable
    #                         pins device memory for the process life

    def fn_for(settings):
        if settings not in fns:
            fns[settings] = jax.jit(
                lambda s, p, i, _st=settings: render_pixels(s, _st, p, i))
        fns.move_to_end(settings)
        while len(fns) > 3:
            fns.popitem(last=False)
        return fns[settings]

    epoch, acc, k = -1, None, 0
    while not st.stop:      # /quit ends the loop OUTSIDE a jax call —
        #                     a daemon thread killed mid-dispatch at
        #                     interpreter exit aborts the process
        with st.lock:
            scene, cur_epoch, settings = st.scene, st.epoch, st.settings
        n = settings.width * settings.height
        pix = jnp.arange(n, dtype=jnp.int32)
        if cur_epoch != epoch:
            epoch, acc, k = cur_epoch, None, 0
        t0 = time.perf_counter()
        out = None
        fn = fn_for(settings)
        for _ in range(batch):
            out = fn(scene, pix, jnp.uint32(k))
            acc = out if acc is None else acc + out
            k += 1
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0) / batch
        img = np.asarray(acc / k).reshape(
            settings.height, settings.width, 3)
        disp = (np.clip(np.asarray(to_display(img, 0.6)), 0, 1)
                * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(disp).save(buf, "PNG")
        with st.lock:
            if st.epoch == epoch:       # drop stale frames after an edit
                st.samples, st.ms_per_sample = k, dt * 1e3
                st.png = buf.getvalue()


def make_handler(st: EditorState):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Cache-Control", "no-store")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            path = urlparse(self.path).path
            if path == "/":
                self._send(200, "text/html", PAGE.encode())
            elif path == "/image":
                with st.lock:
                    png = st.png
                self._send(200 if png else 404, "image/png", png)
            elif path == "/state":
                self._send(200, "application/json",
                           json.dumps(st.snapshot_state()).encode())
            elif path == "/pick":
                q = {k: v[0] for k, v in
                     parse_qs(urlparse(self.path).query).items()}
                try:
                    out = st.pick(int(q["x"]), int(q["y"]))
                    self._send(200, "application/json",
                               json.dumps(out).encode())
                except Exception as e:
                    self._send(400, "application/json",
                               json.dumps({"error": str(e)}).encode())
            else:
                self.send_error(404)

        def do_POST(self):  # noqa: N802
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                if u.path == "/edit":
                    st.apply_edit(int(q["inst"]), float(q["tx"]),
                                  float(q["ty"]), float(q["tz"]),
                                  float(q["s"]), float(q.get("rx", 0)),
                                  float(q.get("ry", 0)),
                                  float(q.get("rz", 0)), int(q["mat"]))
                elif u.path == "/edit_camera":
                    st.apply_camera(*[float(q[k]) for k in
                                      ("px", "py", "pz", "lx", "ly",
                                       "lz", "fov")],
                                    defocus=float(q.get("defocus", 0)),
                                    focus=float(q.get("focus", 0)))
                elif u.path == "/screenshot":
                    p = st.save_screenshot()
                    self._send(200, "application/json",
                               json.dumps({"ok": True,
                                           "path": p}).encode())
                    return
                elif u.path == "/edit_material":
                    st.apply_material(
                        int(q["mat"]),
                        albedo=(float(q["al0"]), float(q["al1"]),
                                float(q["al2"])),
                        roughness=float(q["ro"]), ior=float(q["io"]),
                        emission=(float(q["em0"]), float(q["em1"]),
                                  float(q["em2"])),
                        intensity=float(q["inten"]),
                        opacity=float(q["op"]))
                elif u.path == "/edit_settings":
                    st.apply_settings(int(q["bounces"]),
                                      q["mis"] == "1", float(q["bg"]))
                elif u.path == "/quit":
                    st.stop = True
                    if st.server is not None:
                        threading.Thread(target=st.server.shutdown,
                                         daemon=True).start()
                else:
                    self.send_error(404)
                    return
                self._send(200, "application/json", b'{"ok":true}')
            except Exception as e:  # surface edit errors to the panel
                self._send(400, "application/json",
                           json.dumps({"error": str(e)}).encode())

        def log_message(self, *a):
            pass

    return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model", nargs="?", default=None)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--port", type=int, default=8008)
    ap.add_argument("--batch", type=int, default=2,
                    help="samples per display update")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from nexus_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nexus_tpu.core.config import RenderSettings
    from nexus_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    if args.model:
        from nexus_tpu.io.loader import add_model

        add_model(b, args.model)
    else:
        from nexus_tpu.scenes import blob_mesh

        light = b.add_material(albedo=(0, 0, 0), emission=(1, 1, 0.9),
                               intensity=6.0)
        white = b.add_material(albedo=(0.73, 0.73, 0.73))
        red = b.add_material(mtype=2, albedo=(0.8, 0.25, 0.2),
                             roughness=0.3)
        glass = b.add_material(mtype=1, ior=1.5)
        v, f = blob_mesh(3)
        blob = b.add_mesh_asset(v, f, name="blob")
        qv = np.array([[-3, 3.2, -3], [3, 3.2, -3], [3, 3.2, 3],
                       [-3, 3.2, 3]], np.float32)
        panel = b.add_mesh_asset(qv, np.array([[0, 2, 1], [0, 3, 2]]),
                                 name="light")
        gv = np.array([[-5, -1, -5], [5, -1, -5], [5, -1, 5],
                       [-5, -1, 5]], np.float32)
        ground = b.add_mesh_asset(gv, np.array([[0, 1, 2], [0, 2, 3]]),
                                  name="ground")
        for i, (mat, x) in enumerate([(white, -1.4), (red, 0.0),
                                      (glass, 1.4)]):
            m = np.eye(4, dtype=np.float32)
            m[:3, 3] = (x, 0.0, 0.0)
            b.add_instance(blob, mat, m, name=f"blob{i}")
        b.add_instance(ground, white, np.eye(4, dtype=np.float32))
        b.add_instance(panel, light, np.eye(4, dtype=np.float32))
        b.set_camera(position=(0.0, 1.2, 5.0), look_at=(0.0, 0.0, 0.0),
                     hfov_deg=55.0, width=args.res, height=args.res)
    if b.camera is None:
        b.set_camera(position=(0.0, 1.0, 3.4), look_at=(0.0, 1.0, 0.0),
                     hfov_deg=50.0, width=args.res, height=args.res)
    cam_kw = dict(getattr(b, "_camera_kw", None) or {})
    cam_kw.setdefault("position", (0.0, 1.2, 5.0))
    cam_kw.setdefault("look_at", (0.0, 0.0, 0.0))
    cam_kw.setdefault("hfov_deg", 55.0)
    scene = b.build_instanced()
    settings = RenderSettings(width=args.res, height=args.res,
                              path_length=args.bounces)

    inst_meta = []
    for i, r in enumerate(b._inst_records):
        m = np.asarray(r["transform"], np.float32)
        m34 = m[:3, :] if m.shape[0] == 4 else m
        inst_meta.append({
            "id": i, "name": r["name"],
            "t": [round(float(x), 3) for x in m34[:, 3]],
            "r": [0.0, 0.0, 0.0],
            "s": round(float(np.linalg.norm(m34[:, 0])), 3),
            "mat": int(r["material_id"]),
        })
    cam_meta = {"pos": [round(float(x), 3) for x in cam_kw["position"]],
                "look": [round(float(x), 3) for x in cam_kw["look_at"]],
                "fov": cam_kw.get("hfov_deg", 55.0)}

    st = EditorState(scene, settings, inst_meta, cam_meta)
    render_th = threading.Thread(target=_render_loop,
                                 args=(st, args.batch), daemon=True)
    render_th.start()
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(st))
    st.server = srv
    print(f"editor on http://localhost:{args.port} "
          f"({len(inst_meta)} instances)")
    srv.serve_forever()
    render_th.join(timeout=30)   # let the render loop finish its call
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
