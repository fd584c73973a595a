"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_multihost.py: each process owns 4 virtual CPU devices,
joins a 2-process cluster, and drives a real ImageTrainer chunk through the
multihost data path (``multihost.initialize`` + ``host_local_batch_slice`` +
``make_array_from_process_local_data`` inside ``mesh.shard_batch``).
Process 0 writes the final codebook to ``<outdir>/codebook.npy``.

Usage: python tests/mh_worker.py <pid> <nproc> <port> <outdir>
"""
import os
import re
import sys

flags = os.environ.get('XLA_FLAGS', '')
flags = re.sub(r'--xla_force_host_platform_device_count=\d+', '', flags)
os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=4'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    import numpy as np

    from shacira_tpu.parallel import multihost

    multihost.initialize(f'127.0.0.1:{port}', nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 4 * nproc, jax.devices()

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
