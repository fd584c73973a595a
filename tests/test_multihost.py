"""Real multi-process execution: 2 jax.distributed CPU processes, 4 virtual
devices each, training one ImageTrainer chunk over the global 8-device mesh.

The ≥85%-scaling-at-2-hosts target (BASELINE.md) can't be measured on real
multi-chip hardware in this environment; this test is the evidence that the
multihost glue (`parallel/multihost.py` + the multihost branch of
`parallel/mesh.shard_batch`/`replicate`) executes — coordinator bring-up,
process-local data feeding, SPMD step, replicated result fetch — and that the
distributed result matches single-process training.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'tests', 'mh_worker.py'),
             str(pid), '2', str(port), str(tmp_path)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out}'

    cb2 = np.load(tmp_path / 'codebook.npy')

    # single-process reference (8 local virtual devices, same seed/config)
    from tests.test_parallel import _setup
    t1 = _setup(mesh=None)
    t1.train(epochs=60, finalize=False)
    cb1 = np.asarray(t1.params['grid']['codebook'])
    np.testing.assert_allclose(cb1, cb2, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_two_process_nerf_paged_trace_matches_single_process():
    """The PAGED NeRF shard_map trace across 2 REAL jax.distributed
    processes (4 virtual devices each): the multihost batch sharding
    (mesh.shard_axis process-local slices) + the per-device trace must
    reproduce the single-process 8-device run, which in turn matches
    single-device (test_parallel).  Closes the r4 gap: the 2-process test
    covered only the image trainer."""
    port = _free_port()
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'tests', 'mh_worker.py'),
             str(pid), '2', str(port), str(tmp_out := os.path.join(
                 os.environ.get('TMPDIR', '/tmp'), 'mh_nerf')), 'nerf'],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    os.makedirs(tmp_out, exist_ok=True)
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out}'
    cb2 = np.load(os.path.join(tmp_out, 'codebook_nerf.npy'))

    # single-process reference on an 8-device local mesh (same seeds)
    from tests.mh_worker import nerf_main  # noqa: F401 (config parity)
    import jax
    import jax.numpy as jnp
    from tests.test_nerf import synthetic_scene
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.parallel.mesh import make_mesh
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    data = synthetic_scene(num_views=4, res=16)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=4, min_grid_res=16, max_grid_res=64,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=17, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True, hash_layout='paged',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(
        grid=grid, hidden_dim=16, num_layers=1,
        view_embedder='positional', view_multires=2, blas_level=7)
    tcfg = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=512, bg_color='white',
        max_samples=8192, segment_size=4, seg_budget=4096,
        coarse_level=5, seg_dilation=1, eval_seg_budget=4096,
        group_segs_per_block=8, fine_mode='deferred')
    cfg = MultiviewTrainerConfig(epochs=20, prune_every=-1, chunk_size=4,
                                 use_sga=True, temperature=0.1,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4)
    t = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=64, seed=0,
                         mesh=make_mesh())
    res = 2 ** 7
    g = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sph = (xx ** 2 + yy ** 2 + zz ** 2) < (0.5 + 2.0 / res) ** 2
    t.occ_state = {**t.occ_state, 'occ': jnp.asarray(sph)}
    t._refresh_coarse()
    t.train(num_iterations=8)
    cb1 = np.asarray(t.params['grid']['codebook'])
    np.testing.assert_allclose(cb1, cb2, rtol=5e-3, atol=5e-3)
