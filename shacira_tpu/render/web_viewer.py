"""Interactive web viewer — the TPU-side replacement for the reference's
OpenGL/imgui/CUDA-GL interactive renderer (``wisp/renderer/``).

The reference's interactive stack blits CUDA buffers into GL textures
(wisp/renderer/core/cuda.py) — inherently GPU-local.  On TPU the natural
equivalent is a host-side viewer: a small HTTP server renders frames on the
accelerator and streams JPEGs to a browser.

Camera-control parity with ``wisp/renderer/core/control/``:

* **turntable** — azimuth/elevation orbit around the target, up locked to +Y
  (ref turntable.py); elevation clamped at the poles.
* **trackball** — free orbit, elevation unclamped (can roll over the poles,
  ref trackball.py).
* **first-person** — mouse-look + WASD/QE fly controls (ref first_person.py).
* pan (shift-drag or right-drag) translates the target in the view plane.

Like the reference's interactive mode (radiance_pipeline_renderer.py:56-62),
a quality knob renders at reduced resolution while navigating and re-renders
full-resolution when the camera rests.  Optional data layers
(``PrimitivesPack``) are composited server-side with the frame's depth
buffer, mirroring the active-data-layer painting of wisp_app.py:451.
"""
from __future__ import annotations

import io
import threading
from typing import Dict, Optional
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from shacira_tpu.render.offline import CameraConfig, lookat_rays, render_rays

_PAGE = """<!DOCTYPE html>
<html><head><title>shacira_tpu viewer</title><style>
 body{margin:0;background:#111;color:#eee;font-family:monospace}
 #v{display:block;margin:12px auto;border:1px solid #444;cursor:grab}
 #bar{text-align:center;margin:6px}
 select,label{background:#222;color:#eee;border:1px solid #444}
</style></head><body>
<div style="display:flex;justify-content:center;align-items:flex-start">
<img id="v" width="__W__" height="__H__"/>
<div id="panel" style="margin:12px;min-width:260px;max-width:320px;
 font-size:12px;border:1px solid #444;padding:8px"></div>
</div>
<div id="bar">
 mode <select id="mode"><option>turntable</option><option>trackball</option>
 <option>first-person</option></select>
 quality <select id="q"><option value="1">full</option>
 <option value="0.5" selected>half</option><option value="0.25">quarter</option></select>
 <label><input type="checkbox" id="layers"/>layers</label>
 <span id="s">drag orbit &middot; shift/right-drag pan &middot; wheel zoom &middot; WASDQE fly</span>
</div>
<script>
// stat panels (imgui widget parity: optimization progress / object
// properties / device stats, ref wisp/renderer/gui/imgui/)
async function pollStats(){
  try{
    const r = await fetch('/stats'); const s = await r.json();
    let html='';
    for(const [group, rows] of Object.entries(s)){
      html+='<div style="color:#8cf;margin-top:6px">'+group+'</div>';
      for(const [k,v] of Object.entries(rows))
        html+='<div><span style="color:#999">'+k+'</span> '+v+'</div>';
    }
    document.getElementById('panel').innerHTML=html;
  }catch(e){}
}
setInterval(pollStats, 1000); pollStats();
</script>
<script>
let az=0.8, el=0.4, radius=3.0, t=[0,0,0], o=[0,0,0], busy=false, dirty=true;
let moving=false, restTimer=null;
const img=document.getElementById('v');
const modeEl=document.getElementById('mode'), qEl=document.getElementById('q');
function fps(){ return modeEl.value==='first-person'; }
function eye(){
  if(fps()) return o;
  const ce=Math.cos(el);
  return [t[0]+radius*ce*Math.cos(az), t[1]+radius*Math.sin(el),
          t[2]+radius*ce*Math.sin(az)];
}
function tgt(){
  if(!fps()) return t;
  const ce=Math.cos(el);
  return [o[0]+ce*Math.cos(az), o[1]+Math.sin(el), o[2]+ce*Math.sin(az)];
}
function fetchFrame(final){
  if(busy||!dirty) return; busy=true; dirty=false;
  const e=eye(), g=tgt();
  const q= final? 1.0 : parseFloat(qEl.value);
  img.src='/render?ox='+e[0]+'&oy='+e[1]+'&oz='+e[2]
         +'&tx='+g[0]+'&ty='+g[1]+'&tz='+g[2]+'&q='+q
         +'&layers='+(document.getElementById('layers').checked?1:0)
         +'&t='+Date.now();
  clearTimeout(restTimer);
  if(!final) restTimer=setTimeout(()=>{dirty=true;fetchFrame(true);},350);
}
img.onload=()=>{busy=false; fetchFrame();};
img.onerror=()=>{busy=false;};
let drag=false, pan=false, lx=0, ly=0;
img.oncontextmenu=e=>e.preventDefault();
img.onmousedown=e=>{drag=true; pan=(e.button===2||e.shiftKey);
  lx=e.clientX; ly=e.clientY;};
window.onmouseup=()=>{drag=false;};
window.onmousemove=e=>{ if(!drag) return;
  const dx=(e.clientX-lx), dy=(e.clientY-ly); lx=e.clientX; ly=e.clientY;
  if(pan){  // translate target/origin in the view plane
    const ce=Math.cos(el), f=[ce*Math.cos(az),Math.sin(el),ce*Math.sin(az)];
    const r=[ -f[2],0,f[0] ], n=Math.hypot(r[0],r[2])||1;
    r[0]/=n; r[2]/=n;
    const up=[ -f[1]*f[0], f[0]*f[0]+f[2]*f[2], -f[1]*f[2] ];
    const un=Math.hypot(up[0],up[1],up[2])||1;
    const s=0.002*radius;
    const tg=fps()? o : t;
    tg[0]+=-dx*s*r[0]+dy*s*up[0]/un; tg[1]+=dy*s*up[1]/un;
    tg[2]+=-dx*s*r[2]+dy*s*up[2]/un;
  } else {
    az+=dx*0.01*(fps()?-1:1); el+=dy*0.01*(fps()?1:-1);
    if(modeEl.value==='turntable'||fps())
      el=Math.max(-1.45,Math.min(1.45,el));
  }
  dirty=true; fetchFrame(); };
img.onwheel=e=>{e.preventDefault(); radius*=Math.exp(e.deltaY*0.001);
  dirty=true; fetchFrame();};
window.onkeydown=e=>{ if(!fps()) return;
  const ce=Math.cos(el), f=[ce*Math.cos(az),Math.sin(el),ce*Math.sin(az)];
  const r=[-f[2],0,f[0]], n=Math.hypot(r[0],r[2])||1, s=0.1;
  const k=e.key.toLowerCase();
  if(k==='w'){o[0]+=s*f[0];o[1]+=s*f[1];o[2]+=s*f[2];}
  if(k==='s'){o[0]-=s*f[0];o[1]-=s*f[1];o[2]-=s*f[2];}
  if(k==='a'){o[0]-=s*r[0]/n;o[2]-=s*r[2]/n;}
  if(k==='d'){o[0]+=s*r[0]/n;o[2]+=s*r[2]/n;}
  if(k==='q'){o[1]+=s;} if(k==='e'){o[1]-=s;}
  dirty=true; fetchFrame(); };
modeEl.onchange=()=>{ if(fps()){ const ey=eye(); o=[ey[0],ey[1],ey[2]];
    az+=Math.PI; el=-el; } dirty=true; fetchFrame(); };
document.getElementById('layers').onchange=()=>{dirty=true;fetchFrame();};
qEl.onchange=()=>{dirty=true;fetchFrame();};
setInterval(fetchFrame,100); fetchFrame();
</script></body></html>"""


class ViewerServer:
    """Serves an interactive viewer for a trace function.

    Args:
        trace_fn: (rays, key) -> {'rgb': [N,3], ...} (jit-compiled render).
        camera: frame size / fov / clip planes.
        layers: optional {name: PrimitivesPack} debug layers, composited
            when the client enables the 'layers' toggle.
    """

    def __init__(self, trace_fn,
                 camera: CameraConfig = CameraConfig(width=256, height=256),
                 port: int = 8008,
                 layers: Optional[Dict[str, object]] = None,
                 stats_fn=None):
        self.trace_fn = trace_fn
        self.camera = camera
        self.port = port
        self.layers = layers or {}
        self.stats_fn = stats_fn        # () -> {group: {key: value}}
        self._frame_ms = 0.0
        self._lock = threading.Lock()
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == '/':
                    page = (_PAGE.replace('__W__', str(viewer.camera.width))
                            .replace('__H__', str(viewer.camera.height)))
                    self.send_response(200)
                    self.send_header('Content-Type', 'text/html')
                    self.end_headers()
                    self.wfile.write(page.encode())
                elif url.path == '/render':
                    q = parse_qs(url.query)

                    def get(name, default):
                        return float(q.get(name, [default])[0])
                    if 'ox' in q:
                        origin = (get('ox', 0), get('oy', 0), get('oz', 3))
                        target = (get('tx', 0), get('ty', 0), get('tz', 0))
                    else:   # legacy orbit params
                        theta, phi = get('theta', 0.8), get('phi', 0.4)
                        radius = get('radius', 3.0)
                        origin = (radius * np.cos(phi) * np.cos(theta),
                                  radius * np.sin(phi),
                                  radius * np.cos(phi) * np.sin(theta))
                        target = (0.0, 0.0, 0.0)
                    data = viewer.render_jpeg_at(
                        origin, target, scale=get('q', 1.0),
                        with_layers=q.get('layers', ['0'])[0] == '1')
                    self.send_response(200)
                    self.send_header('Content-Type', 'image/jpeg')
                    self.end_headers()
                    self.wfile.write(data)
                elif url.path == '/stats':
                    import json as _json
                    self.send_response(200)
                    self.send_header('Content-Type', 'application/json')
                    self.end_headers()
                    self.wfile.write(_json.dumps(viewer.stats()).encode())
                else:
                    self.send_response(404)
                    self.end_headers()

        self._handler = Handler
        self._server = None

    # ------------------------------------------------------------------
    def stats(self) -> dict:
        """Grouped stat panels — the imgui widget-panel equivalent
        (optimization progress / object properties via ``stats_fn``;
        renderer + device stats built in; ref
        wisp/renderer/gui/imgui/widget_optimization.py, widget_gpu_stats.py).
        """
        out = {}
        if self.stats_fn is not None:
            try:
                out.update(self.stats_fn())
            except Exception as e:           # panel must not kill the server
                out['optimization'] = {'error': str(e)}
        rend = {'frame_ms': round(self._frame_ms, 1),
                'resolution': f'{self.camera.width}x{self.camera.height}'}
        try:
            import jax
            dev = jax.local_devices()[0]
            rend['device'] = f'{dev.platform}:{dev.id}'
            mem = dev.memory_stats() or {}
            if 'bytes_in_use' in mem:
                rend['mem_in_use_mb'] = round(mem['bytes_in_use'] / 1e6, 1)
            if 'peak_bytes_in_use' in mem:
                rend['mem_peak_mb'] = round(
                    mem['peak_bytes_in_use'] / 1e6, 1)
        except Exception:
            pass
        out['renderer'] = rend
        return out

    def render_frame_at(self, origin, target, scale: float = 1.0,
                        with_layers: bool = False) -> np.ndarray:
        """Render a frame for an arbitrary lookat camera.  ``scale`` < 1
        renders at reduced resolution (the interactive-quality knob)."""
        import time as _time
        cam = self.camera
        if scale < 1.0:
            cam = CameraConfig(
                width=max(16, int(cam.width * scale)),
                height=max(16, int(cam.height * scale)),
                fov=cam.fov, dist_min=cam.dist_min, dist_max=cam.dist_max)
        ro, rd = lookat_rays(origin, target, cam)
        t0 = _time.time()
        with self._lock:
            out = render_rays(self.trace_fn, ro, rd, cam)
        self._frame_ms = (_time.time() - t0) * 1e3
        frame = out['rgb'].reshape(cam.height, cam.width, 3)
        if with_layers and self.layers:
            from shacira_tpu.render.overlay import PinholeCamera, draw_layers
            pc = PinholeCamera.from_lookat(origin, target, cam)
            depth = out.get('depth')
            if depth is not None:
                depth = depth.reshape(cam.height, cam.width)
            frame = draw_layers(frame, pc, self.layers, depth=depth)
        return frame

    def render_frame(self, theta: float, phi: float,
                     radius: float) -> np.ndarray:
        """Legacy orbit entry point (kept for API stability)."""
        origin = (radius * np.cos(phi) * np.cos(theta),
                  radius * np.sin(phi),
                  radius * np.cos(phi) * np.sin(theta))
        return self.render_frame_at(origin, (0.0, 0.0, 0.0))

    def render_jpeg_at(self, origin, target, scale: float = 1.0,
                       with_layers: bool = False) -> bytes:
        from PIL import Image
        frame = self.render_frame_at(origin, target, scale, with_layers)
        img = Image.fromarray(np.clip(frame * 255, 0, 255).astype(np.uint8))
        if frame.shape[0] != self.camera.height:   # upscale reduced renders
            img = img.resize((self.camera.width, self.camera.height),
                             Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, format='JPEG', quality=85)
        return buf.getvalue()

    def render_jpeg(self, theta: float, phi: float, radius: float) -> bytes:
        origin = (radius * np.cos(phi) * np.cos(theta),
                  radius * np.sin(phi),
                  radius * np.cos(phi) * np.sin(theta))
        return self.render_jpeg_at(origin, (0.0, 0.0, 0.0))

    def serve_forever(self):
        self._server = ThreadingHTTPServer(('0.0.0.0', self.port),
                                           self._handler)
        print(f'viewer at http://localhost:{self.port}/')
        self._server.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        if self._server is not None:
            self._server.shutdown()
