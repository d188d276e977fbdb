"""Multi-host runtime coverage (parallel/multihost.py).

Real multi-process execution needs a pod; here every branch runs under
the 8-virtual-device CPU mesh, with the process-level seams
(jax.distributed.initialize, process_count, process_allgather) mocked —
the same strategy SURVEY.md §4 prescribes for cluster-free testing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtweekend_tpu.parallel import multihost
from rtweekend_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS


def test_global_mesh_default():
    mesh = multihost.global_mesh()
    assert mesh.axis_names == (TILE_AXIS, SAMPLE_AXIS)
    assert mesh.devices.shape == (len(jax.devices()), 1)


def test_global_mesh_samples_axis():
    mesh = multihost.global_mesh(samples_axis=2)
    assert mesh.devices.shape == (len(jax.devices()) // 2, 2)


def test_global_mesh_indivisible_raises():
    with pytest.raises(ValueError, match="not divisible"):
        multihost.global_mesh(samples_axis=3)


def test_gather_framebuffer_single_process():
    fb = jnp.arange(24.0).reshape(2, 4, 3)
    out = multihost.gather_framebuffer(fb)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out, np.asarray(fb))


def test_gather_framebuffer_multiprocess_branch(monkeypatch):
    """process_count > 1 must route through process_allgather."""
    from jax.experimental import multihost_utils

    called = {}

    def fake_allgather(x, tiled=False):
        called["tiled"] = tiled
        return np.asarray(x) + 1.0

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    fb = jnp.ones((2, 2, 3))
    out = multihost.gather_framebuffer(fb)
    assert called == {"tiled": True}
    np.testing.assert_array_equal(out, np.full((2, 2, 3), 2.0))


def test_initialize_passthrough(monkeypatch):
    """initialize() forwards explicit coordinator args and passes no
    args in the env-autodetected (Cloud TPU) case."""
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    multihost.initialize()
    multihost.initialize("host0:1234", num_processes=4, process_id=1)
    assert calls[0] == {}
    assert calls[1] == dict(
        coordinator_address="host0:1234", num_processes=4, process_id=1
    )
