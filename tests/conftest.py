"""Test environment: run everything on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: this image's sitecustomize registers an 'axon' TPU platform and forces
``jax_platforms='axon,cpu'`` from inside ``register()`` — env vars alone are
overridden, so we must update jax.config after import (before any arrays are
created by tests)."""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
