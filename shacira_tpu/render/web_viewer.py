"""Interactive web viewer — the TPU-side replacement for the reference's
OpenGL/imgui/CUDA-GL interactive renderer (``wisp/renderer/``).

The reference's interactive stack blits CUDA buffers into GL textures
(wisp/renderer/core/cuda.py) — inherently GPU-local.  On TPU the natural
equivalent is a host-side viewer: a small HTTP server renders frames on the
accelerator and streams JPEGs to a browser with orbit controls.  Like the
reference's interactive mode (radiance_pipeline_renderer.py:56-62), an
interactive quality knob lowers the sample count while navigating.
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from shacira_tpu.render.offline import CameraConfig, lookat_rays, render_rays

_PAGE = """<!DOCTYPE html>
<html><head><title>shacira_tpu viewer</title><style>
 body{margin:0;background:#111;color:#eee;font-family:monospace}
 #v{display:block;margin:16px auto;border:1px solid #444;cursor:grab}
 #s{text-align:center}
</style></head><body>
<img id="v" width="__W__" height="__H__"/>
<div id="s">drag to orbit &middot; wheel to zoom</div>
<script>
let theta=0.8, phi=0.4, radius=3.0, busy=false, dirty=true;
const img=document.getElementById('v');
function fetchFrame(){
  if(busy||!dirty) return; busy=true; dirty=false;
  img.src='/render?theta='+theta+'&phi='+phi+'&radius='+radius+'&t='+Date.now();
}
img.onload=()=>{busy=false; fetchFrame();};
img.onerror=()=>{busy=false;};
let drag=false,lx=0,ly=0;
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY;};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{ if(!drag) return;
  theta+=(e.clientX-lx)*0.01; phi+=(e.clientY-ly)*0.01;
  phi=Math.max(-1.4,Math.min(1.4,phi)); lx=e.clientX; ly=e.clientY;
  dirty=true; fetchFrame(); };
img.onwheel=e=>{e.preventDefault(); radius*=Math.exp(e.deltaY*0.001);
  dirty=true; fetchFrame();};
setInterval(fetchFrame,100); fetchFrame();
</script></body></html>"""


class ViewerServer:
    """Serves an orbit-control viewer for a trace function.

    Args:
        trace_fn: (rays, key) -> {'rgb': [N,3], ...} (jit-compiled render).
        camera: frame size / fov / clip planes.
    """

    def __init__(self, trace_fn, camera: CameraConfig = CameraConfig(width=256, height=256),
                 port: int = 8008):
        self.trace_fn = trace_fn
        self.camera = camera
        self.port = port
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
                    theta = float(q.get('theta', [0.8])[0])
                    phi = float(q.get('phi', [0.4])[0])
                    radius = float(q.get('radius', [3.0])[0])
                    data = viewer.render_jpeg(theta, phi, radius)
                    self.send_response(200)
                    self.send_header('Content-Type', 'image/jpeg')
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self.send_response(404)
                    self.end_headers()

        self._handler = Handler
        self._server = None

    def render_frame(self, theta: float, phi: float, radius: float) -> np.ndarray:
        origin = np.asarray([radius * np.cos(phi) * np.cos(theta),
                             radius * np.sin(phi),
                             radius * np.cos(phi) * np.sin(theta)], np.float32)
        ro, rd = lookat_rays(origin, [0, 0, 0], self.camera)
        with self._lock:
            out = render_rays(self.trace_fn, ro, rd, self.camera)
        return out['rgb'].reshape(self.camera.height, self.camera.width, 3)

    def render_jpeg(self, theta: float, phi: float, radius: float) -> bytes:
        from PIL import Image
        frame = self.render_frame(theta, phi, radius)
        img = Image.fromarray(np.clip(frame * 255, 0, 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format='JPEG', quality=85)
        return buf.getvalue()

    def serve_forever(self):
        self._server = ThreadingHTTPServer(('0.0.0.0', self.port), self._handler)
        print(f'viewer at http://localhost:{self.port}/')
        self._server.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        if self._server is not None:
            self._server.shutdown()
