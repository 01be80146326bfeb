"""Interactive scene editor: live progressive render + hierarchy panel.

The TPU-native analog of the reference's interactive edit loop —
SceneHierarchyPanel (instance tree, TRS + material editors,
Nexus/src/Renderer/Panels/SceneHierarchyPanel.cpp:20-212) driving
Scene invalidation and accumulation restart
(Nexus/src/Renderer/Renderer.cpp:41-77, Scene.cpp:29-55) — re-expressed
as a browser panel over a headless render loop:

  - a render thread accumulates samples progressively (AccumulateKernel
    running-mean semantics) and serves the live image;
  - the panel lists every instance (name, translate/scale, material)
    with editable fields; an edit POST applies the FUNCTIONAL refit
    (scene/edit.py set_transform / set_material — no rebuild, no
    recompile) and resets accumulation, exactly the reference's
    invalidate -> update -> ResetFrameNumber cycle.

Usage:
  python -m nexus_tpu.apps.editor model.glb --port 8008 [--res 256]
  # open http://localhost:8008  (any port-forward works)

Works for instanced scenes (build_instanced); transforms edits need
instances by construction. Materials can be re-bound on any scene.
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

PAGE = """<!doctype html><html><head><title>nexus_tpu editor</title>
<style>
 body{background:#14151a;color:#c9cdd6;font-family:monospace;margin:0;
      display:flex;height:100vh}
 #left{flex:1;display:flex;align-items:center;justify-content:center}
 img{image-rendering:pixelated;max-width:60vw;max-height:92vh}
 #panel{width:430px;overflow-y:auto;background:#1b1d24;padding:12px;
        border-left:1px solid #333}
 h3{margin:4px 0 10px;color:#8ab4ff} .inst{border:1px solid #333;
   border-radius:6px;padding:8px;margin-bottom:8px}
 input,select{background:#0f1014;color:#c9cdd6;border:1px solid #444;
   width:52px;margin:1px} select{width:150px}
 button{background:#2b3a55;color:#dde;border:none;border-radius:4px;
   padding:3px 10px;margin-top:4px;cursor:pointer}
 #status{color:#7a8;margin-bottom:8px}
</style></head><body>
<div id=left><img id=im src="/image?t=0"></div>
<div id=panel><h3>scene hierarchy</h3><div id=status></div>
<div id=list></div></div>
<script>
async function refresh(){
  const s = await (await fetch('/state')).json();
  document.getElementById('status').textContent =
    s.samples + ' spp · ' + s.ms_per_sample.toFixed(0) + ' ms/sample';
  const list = document.getElementById('list');
  if (list.childElementCount === 0) {
    for (const inst of s.instances) {
      const d = document.createElement('div'); d.className = 'inst';
      d.innerHTML = `<b>#${inst.id} ${inst.name}</b><br>
        t <input id=tx${inst.id} value=${inst.t[0]}>
          <input id=ty${inst.id} value=${inst.t[1]}>
          <input id=tz${inst.id} value=${inst.t[2]}>
        s <input id=s${inst.id} value=${inst.s}><br>
        mat <select id=m${inst.id}>${s.materials.map((m,j)=>
          `<option value=${j} ${j==inst.mat?'selected':''}>${j}: ${m}</option>`).join('')}
        </select>
        <button onclick=apply(${inst.id})>apply</button>`;
      list.appendChild(d);
    }
  }
}
async function apply(i){
  const q = new URLSearchParams({inst:i,
    tx:document.getElementById('tx'+i).value,
    ty:document.getElementById('ty'+i).value,
    tz:document.getElementById('tz'+i).value,
    s:document.getElementById('s'+i).value,
    mat:document.getElementById('m'+i).value});
  await fetch('/edit?'+q.toString(), {method:'POST'});
}
setInterval(()=>{
  const im=document.getElementById('im');
  const p=new Image(); p.onload=()=>{im.src=p.src};
  p.src='/image?t='+Date.now(); refresh();
}, 1000);
refresh();
</script></body></html>"""


class EditorState:
    """Shared state between the render loop and the HTTP handlers."""

    def __init__(self, scene, settings, inst_meta, mat_names):
        self.lock = threading.Lock()
        self.scene = scene
        self.settings = settings
        self.inst_meta = inst_meta      # [{id, name, t, s, mat}]
        self.mat_names = mat_names
        self.acc = None
        self.samples = 0
        self.epoch = 0                  # bumped by edits
        self.ms_per_sample = 0.0
        self.png = b""

    def snapshot_state(self):
        with self.lock:
            return {
                "samples": self.samples,
                "ms_per_sample": self.ms_per_sample,
                "instances": self.inst_meta,
                "materials": self.mat_names,
            }

    def apply_edit(self, inst, tx, ty, tz, s, mat):
        from nexus_tpu.scene import edit as edit_mod

        m = np.eye(4, dtype=np.float32)
        m[0, 0] = m[1, 1] = m[2, 2] = s
        m[:3, 3] = (tx, ty, tz)
        with self.lock:
            scene = self.scene
        scene = edit_mod.set_transform(scene, inst, m)
        if mat != self.inst_meta[inst]["mat"]:
            scene = edit_mod.set_material(scene, inst, mat)
        with self.lock:
            self.scene = scene
            self.inst_meta[inst].update(t=[tx, ty, tz], s=s, mat=mat)
            self.epoch += 1             # invalidation: restart accumulation


def _render_loop(st: EditorState, batch: int):
    """Progressive accumulation; restarts on epoch change
    (ResetFrameNumber semantics, Renderer.cpp:52-56)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from nexus_tpu.core.tonemap import to_display
    from nexus_tpu.render.wavefront import render_pixels

    settings = st.settings
    n = settings.width * settings.height
    pix = jnp.arange(n, dtype=jnp.int32)
    fn = jax.jit(lambda s, p, i: render_pixels(s, settings, p, i))

    epoch, acc, k = -1, None, 0
    while True:
        with st.lock:
            scene, cur_epoch = st.scene, st.epoch
        if cur_epoch != epoch:
            epoch, acc, k = cur_epoch, None, 0
        t0 = time.perf_counter()
        out = None
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
            else:
                self.send_error(404)

        def do_POST(self):  # noqa: N802
            u = urlparse(self.path)
            if u.path != "/edit":
                self.send_error(404)
                return
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                st.apply_edit(int(q["inst"]), float(q["tx"]),
                              float(q["ty"]), float(q["tz"]),
                              float(q["s"]), int(q["mat"]))
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
            "s": round(float(np.linalg.norm(m34[:, 0])), 3),
            "mat": int(r["material_id"]),
        })
    mat_names = [f"type{int(t)}" for t in
                 np.asarray(scene.materials.mtype)]

    st = EditorState(scene, settings, inst_meta, mat_names)
    threading.Thread(target=_render_loop, args=(st, args.batch),
                     daemon=True).start()
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(st))
    print(f"editor on http://localhost:{args.port} "
          f"({len(inst_meta)} instances)")
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
