"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_multihost.py: each process owns 4 virtual CPU devices,
joins a 2-process cluster, and drives a real ImageTrainer chunk through the
multihost data path (``multihost.initialize`` + ``host_local_batch_slice`` +
``make_array_from_process_local_data`` inside ``mesh.shard_batch``).
Process 0 writes the final codebook to ``<outdir>/codebook.npy``.

Usage: python tests/mh_worker.py <pid> <nproc> <port> <outdir> [mode]

``mode`` 'image' (default) drives the ImageTrainer multihost data path;
'nerf' drives the PAGED NeRF shard_map trace (march, budgeted compactions,
segment grouping, Pallas encode in interpret mode) across the global
2-process mesh — the multihost half of
tests/test_parallel.py::test_nerf_paged_shard_map_trace_matches_single_device.
"""
import os
import re
import sys

flags = os.environ.get('XLA_FLAGS', '')
flags = re.sub(r'--xla_force_host_platform_device_count=\d+', '', flags)
os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=4'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def nerf_main(pid, nproc, outdir):
    """Paged NeRF trainer on the global mesh (same config as
    test_parallel.py::test_nerf_paged_shard_map_trace...)."""
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_nerf import synthetic_scene
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.parallel import multihost
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
                         mesh=multihost.global_mesh())
    res = 2 ** 7
    g = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sph = (xx ** 2 + yy ** 2 + zz ** 2) < (0.5 + 2.0 / res) ** 2
    # multihost: the replacement occupancy must be a GLOBAL replicated
    # array like the rest of occ_state (local arrays cannot mix into the
    # jitted refresh)
    from shacira_tpu.parallel import mesh as pmesh
    t.occ_state = {**t.occ_state, 'occ': pmesh.replicate(t.mesh, sph)}
    t._refresh_coarse()
    t.train(num_iterations=8)
    assert t._shard_ray_active, 'paged trace must ride shard_map'
    cb = np.asarray(t.params['grid']['codebook'])
    if pid == 0:
        np.save(os.path.join(outdir, 'codebook_nerf.npy'), cb)
    print(f'worker {pid}: nerf done, codebook {cb.shape}', flush=True)


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else 'image'
    import numpy as np

    from shacira_tpu.parallel import multihost

    multihost.initialize(f'127.0.0.1:{port}', nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    if mode == 'nerf':
        return nerf_main(pid, nproc, outdir)

    # identical trainer setup to tests/test_parallel.py::_setup
    from shacira_tpu.datasets.image import ImageDataset
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import (ImageTrainer,
                                                    ImageTrainerConfig)

    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 3).astype(np.float32)
    ds = ImageDataset(img, sample_mode='full')
    grid = LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=4, min_grid_res=4, max_grid_res=16,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.1, codebook_bitwidth=6, init_grid='uniform',
        num_prob_layers=2, entropy_enabled=True,
    ).with_ldec(dict(norm='max', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=8, num_layers=1)
    tcfg = ImageTrainerConfig(epochs=60, log_every=-1, entropy_reg=1e-4,
                              entropy_reg_end=1e-4, chunk_size=30,
                              norm='max')
    trainer = ImageTrainer(tcfg, mcfg, ds, seed=0,
                           mesh=multihost.global_mesh())
    trainer.train(epochs=60, finalize=False)

    cb = np.asarray(trainer.params['grid']['codebook'])
    if pid == 0:
        np.save(os.path.join(outdir, 'codebook.npy'), cb)
    print(f'worker {pid}: done, codebook {cb.shape}', flush=True)


if __name__ == '__main__':
    main()
