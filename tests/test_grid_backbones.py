"""End-to-end tests for the alternative grid backbones (grid_type dispatch).

The reference trains NeRF on any of OctreeGrid (NGLOD), CodebookOctreeGrid
(VQAD), TriplanarGrid, HashGrid, LatentGrid via the ``grid_type`` arg
(app/nerf/main_nerf.py:371-505).  These tests drive each backbone through
the REAL config path (``build_grid_config``) and the real MultiviewTrainer
on a tiny synthetic scene: a few training steps must run, reduce the loss,
render, and report sizes.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, 'tests')

from test_nerf import synthetic_scene  # noqa: E402

from shacira_tpu import config as cfg_mod  # noqa: E402
from shacira_tpu.tracers import rf_tracer  # noqa: E402
from shacira_tpu.trainers.multiview_trainer import (  # noqa: E402
    MultiviewTrainer, MultiviewTrainerConfig)


def _args(grid_type, extra=()):
    parser = cfg_mod.add_nerf_args(cfg_mod.build_image_parser())
    return cfg_mod.parse_args(parser, [
        '--grid-type', grid_type, '--platform', 'cpu',
        '--feature-dim', '2', '--feature-std', '0.05',
        '--base-lod', '2', '--num-lods', '2',
        '--min-grid-res', '4', '--max-grid-res', '16',
        '--codebook-bitwidth', '4', '--blas-level', '3',
        '--hidden-dim', '16', '--num-steps', '32',
        '--prune-min-density', '1.0',
        '--epochs', '50', '--chunk-size', '10', '--prune-every', '-1',
        '--grid-lr', '0.05', '--log-every', '1', *extra])


def _train_small(args, iters=40):
    data = synthetic_scene(num_views=6, res=16)
    mcfg = cfg_mod.build_nerf_model_config(args)
    tcfg = cfg_mod.build_nerf_trainer_config(args)
    trcfg = cfg_mod.build_tracer_config(args)
    tr = MultiviewTrainer(tcfg, mcfg, trcfg, data, num_rays=128, seed=0)
    losses = []
    tr.train(num_iterations=iters,
             log_fn=lambda e: losses.append(e['rgb_loss']))
    return tr, losses


@pytest.mark.parametrize('grid_type', ['OctreeGrid', 'CodebookOctreeGrid',
                                       'TriplanarGrid', 'HashGrid'])
@pytest.mark.slow
def test_backbone_trains_and_renders(grid_type):
    args = _args(grid_type)
    tr, losses = _train_small(args)
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], (grid_type, losses)
    img = tr.render_view(0)
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
    rep = tr.size_report(use_codec=False)
    assert rep['total_size_kb'] > 0


def test_hashgrid_dispatch_has_no_latent_decoder():
    """'HashGrid' must strip the latent decoder even when the YAML's
    latent_decoder section enables it (ref main_nerf.py:443-469)."""
    args = _args('HashGrid', extra=['--ldecode-enabled', 'true',
                                    '--latent-dim', '1'])
    gcfg = cfg_mod.build_grid_config(args, resolution_dim=3)
    assert gcfg.ldec is None
    # raw fp accounting (ref hash_grid.py:101-102): table entries hold
    # feature_dim floats when no decoder is attached
    assert gcfg.effective_latent_dim == gcfg.feature_dim


def test_grid_type_rejects_unknown_and_2d_octree():
    args = _args('OctreeGrid')
    with pytest.raises(ValueError):
        cfg_mod.build_grid_config(args, resolution_dim=2)
    args.grid_type = 'NoSuchGrid'
    with pytest.raises(ValueError):
        cfg_mod.build_grid_config(args, resolution_dim=3)


@pytest.mark.slow
def test_codebook_eval_uses_argmax_lookup():
    """Eval render must use the hard argmax dictionary path (different from
    the straight-through soft mix only in gradients/off-argmax mass) —
    check the two agree after a few steps of sharpening-free training."""
    args = _args('CodebookOctreeGrid')
    tr, _ = _train_small(args, iters=10)
    from shacira_tpu.models.nefs import nerf as nerf_mod
    import jax.numpy as jnp
    pts = jnp.asarray(np.random.RandomState(0).rand(64, 3) * 1.2 - 0.6,
                      jnp.float32)
    d_train = nerf_mod.nerf_density(tr.params, tr.model_cfg, pts,
                                    structure=tr.structure_tables,
                                    training=True)
    d_eval = nerf_mod.nerf_density(tr.params, tr.model_cfg, pts,
                                   structure=tr.structure_tables,
                                   training=False)
    # straight-through forward IS the hard one-hot mix -> identical forward
    np.testing.assert_allclose(np.asarray(d_train), np.asarray(d_eval),
                               rtol=1e-5, atol=1e-6)


def test_octree_from_mesh_and_from_spc():
    """from_mesh covers the surface cells; from_spc wraps an octree
    (ref octree_grid.py:121-249)."""
    from shacira_tpu.models.grids import octree_grid as og
    from shacira_tpu.ops import spc
    cfg = og.OctreeGridConfig(feature_dim=2, base_lod=2, num_lods=2)
    # unit octahedron mesh
    v = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                    [0, 0, 1], [0, 0, -1]], np.float64)
    f = np.asarray([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                    [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64)
    st = og.OctreeStructure.from_mesh(cfg, (v, f), num_samples_on_mesh=2000)
    top = cfg.active_lods[-1]
    n_occ = st.octree.num_cells(top)
    assert 0 < n_occ < (2 ** top) ** 3          # sparse: surface only
    # interpolation on the surface is inside the octree; far corner is not
    import jax, jax.numpy as jnp
    params = og.octree_grid_init(jax.random.PRNGKey(0), cfg, st)
    surf = jnp.asarray([[0.57, 0.57, 0.0]], jnp.float32) / 1.0
    feats = og.interpolate(params, cfg, st.tables(), surf)
    assert np.isfinite(np.asarray(feats)).all()

    oc = spc.Octree.from_pointcloud(np.asarray([[0.0, 0.0, 0.0]]), top)
    st2 = og.OctreeStructure.from_spc(cfg, oc)
    assert st2.num_corners[top] == 8
    with pytest.raises(ValueError):
        og.OctreeStructure.from_spc(
            og.OctreeGridConfig(feature_dim=2, base_lod=4, num_lods=2),
            oc)  # octree too shallow for the requested LODs
