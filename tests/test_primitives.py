"""PrimitivesPack / overlay rasterizer / HTML debugger tests.

Covers the debug-layer subsystem (ref wisp/core/primitives.py, the GL gizmos
in wisp/renderer/gizmos/ogl/, and wisp/utils/debug.py::PsDebugger)."""
import numpy as np
import pytest

from shacira_tpu.core import colors
from shacira_tpu.core.primitives import (
    PrimitivesPack, aabb_lines, axes_gizmo, occupancy_wireframe, world_grid)
from shacira_tpu.core.transforms import ObjectTransform
from shacira_tpu.render.offline import CameraConfig, lookat_rays
from shacira_tpu.render.overlay import (PinholeCamera, draw_layers,
                                        rasterize_points)


def test_pack_add_append_eq():
    p = PrimitivesPack()
    p.add_lines(np.zeros(3), np.ones(3), colors.red)
    p.add_lines(np.zeros((2, 3)), np.ones((2, 3)), np.ones((2, 4)))
    s, e, c = p.lines
    assert s.shape == (3, 3) and c.shape == (3, 4)
    assert c[0, 3] == 1.0          # RGB promoted to RGBA
    q = PrimitivesPack()
    q.add_points([0.5, 0.5, 0.5], colors.green)
    q.append(p)
    assert q.lines[0].shape == (3, 3) and q.points[0].shape == (1, 3)
    assert q != p
    r = PrimitivesPack()
    r.add_lines(np.zeros(3), np.ones(3), colors.red)
    p2 = PrimitivesPack()
    p2.add_lines(np.zeros(3), np.ones(3), colors.red)
    assert r == p2


def test_builders_shapes():
    assert aabb_lines(np.zeros(3), 0.5).lines[0].shape == (12, 3)
    assert aabb_lines(np.zeros((3, 3)), 0.5).lines[0].shape == (36, 3)
    g = world_grid(squares_per_axis=4, grid_size=1.0, plane='xz')
    s, e, _ = g.lines
    assert s.shape == (10, 3)               # (n+1) lines per direction
    assert np.all(s[:, 1] == 0) and np.all(e[:, 1] == 0)   # on the y=0 plane
    a = axes_gizmo(2.0).lines
    assert a[0].shape == (3, 3)
    np.testing.assert_allclose(a[1][0], [2, 0, 0])         # +X endpoint
    np.testing.assert_allclose(a[2][0][:3], colors.red)


def test_occupancy_wireframe_counts_and_extent():
    occ = np.zeros((4, 4, 4), bool)
    occ[0, 0, 0] = occ[3, 3, 3] = True
    pack = occupancy_wireframe(occ, extent=1.0)
    s, e, _ = pack.lines
    assert s.shape == (24, 3)               # 12 edges per occupied cell
    assert s.min() >= -1.0 - 1e-6 and e.max() <= 1.0 + 1e-6
    assert occupancy_wireframe(np.zeros((2, 2, 2), bool)).lines is None
    # subsampling cap
    big = occupancy_wireframe(np.ones((8, 8, 8), bool), max_cells=10)
    assert big.lines[0].shape == (120, 3)


def test_projection_matches_raygen():
    """A point marched along pixel (j, i)'s ray must project back to it."""
    cfg = CameraConfig(width=64, height=48, fov=40.0)
    origin, target = (0.5, 1.0, 3.0), (0.0, 0.0, 0.0)
    ro, rd = lookat_rays(origin, target, cfg)
    cam = PinholeCamera.from_lookat(origin, target, cfg)
    idx = np.array([0, 500, 48 * 64 - 1])
    pts = ro[idx] + 2.0 * rd[idx]
    col, row, depth, front = cam.project(pts)
    jj, ii = idx // 64, idx % 64
    np.testing.assert_allclose(col, ii, atol=1e-2)
    np.testing.assert_allclose(row, jj, atol=1e-2)
    assert np.all(front) and np.all(depth > 0)


def test_draw_layers_blends_and_depth_tests():
    cfg = CameraConfig(width=32, height=32, fov=45.0)
    cam = PinholeCamera.from_lookat((0, 0, 3), (0, 0, 0), cfg)
    img = np.zeros((32, 32, 3), np.float32)
    pack = PrimitivesPack()
    pack.add_lines([-0.5, 0.0, 0.0], [0.5, 0.0, 0.0], colors.red)
    out = draw_layers(img, cam, {'l': pack})
    assert out is not img and np.any(out[:, :, 0] > 0.5)
    assert np.all(out[:, :, 2] == 0)
    # occluder in front of the line (depth 1.0 < line depth 3.0) hides it
    occluded = np.full((32, 32), 1.0, np.float32)
    out2 = draw_layers(img, cam, {'l': pack}, depth=occluded)
    assert not np.any(out2[:, :, 0] > 0)
    # depth buffer behind the line keeps it
    behind = np.full((32, 32), 5.0, np.float32)
    out3 = draw_layers(img, cam, {'l': pack}, depth=behind)
    assert np.any(out3[:, :, 0] > 0.5)


def test_line_behind_camera_clipped():
    cfg = CameraConfig(width=16, height=16, fov=45.0)
    cam = PinholeCamera.from_lookat((0, 0, 2), (0, 0, 0), cfg)
    img = np.zeros((16, 16, 3), np.float32)
    pack = PrimitivesPack()
    pack.add_lines([0.0, 0.0, 5.0], [0.0, 0.0, 8.0], colors.red)  # behind
    out = draw_layers(img, cam, {'l': pack})
    assert not np.any(out > 0)
    # segment crossing the camera plane draws only its front part
    pack2 = PrimitivesPack()
    pack2.add_lines([0.0, 0.0, 5.0], [0.0, 0.0, -1.0], colors.green)
    out2 = draw_layers(img, cam, {'l': pack2})
    assert np.any(out2[:, :, 1] > 0)


def test_pack_transform_applied():
    cfg = CameraConfig(width=16, height=16, fov=45.0)
    cam = PinholeCamera.from_lookat((0, 0, 2), (0, 0, 0), cfg)
    pack = PrimitivesPack(transform=ObjectTransform().translate((100, 0, 0)))
    pack.add_lines([-0.5, 0, 0], [0.5, 0, 0], colors.red)
    out = draw_layers(np.zeros((16, 16, 3), np.float32), cam, {'l': pack})
    assert not np.any(out > 0)              # moved out of frustum


def test_points_splat():
    cfg = CameraConfig(width=17, height=17, fov=45.0)
    cam = PinholeCamera.from_lookat((0, 0, 2), (0, 0, 0), cfg)
    img = np.zeros((17, 17, 3), np.float32)
    rasterize_points(img, cam, [[0.0, 0.0, 0.0]], [[0, 0, 1, 1]],
                     point_size=3.0)
    assert img[8, 8, 2] == 1.0
    assert img[:, :, 2].sum() == 9.0        # 3x3 splat


def test_ps_debugger_html(tmp_path):
    from shacira_tpu.utils.debugger import PsDebugger
    dbg = PsDebugger()
    pts = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    dbg.register_point_cloud('pc', pts)
    dbg.add_scalar_quantity('pc', 'd', np.arange(10.0))
    dbg.add_vector_quantity('pc', 'n', np.ones((10, 3)))
    dbg.register_curve_network('rays', np.zeros((4, 2, 3)))
    obj = tmp_path / 'tri.obj'
    obj.write_text('v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n')
    dbg.add_surface_mesh('mesh', str(obj))
    path = dbg.show(str(tmp_path / 'dbg.html'))
    html = open(path).read()
    assert '"pc"' in html and '"rays"' in html and '"mesh"' in html
    assert 'faces' in html and html.startswith('<!doctype html>')
    import json as _json
    payload = dbg.payload()
    assert payload['pc']['color_name'] == 'd'
    assert len(payload['pc']['pos']) == 10
    _json.dumps(payload)                    # serializable
