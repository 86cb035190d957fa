"""Single-process path of the multihost helpers (the multi-process entry
points follow the standard jax.distributed recipe; here we validate the mesh
assembly + global batch construction on the virtual device pool)."""

import jax
import numpy as np
import pytest

from pangenome_index_tpu.parallel.multihost import global_mesh, global_read_batch, init_distributed


def test_init_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    init_distributed()  # must not raise


def test_global_batch_assembly():
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual 8-device pool")
    mesh = global_mesh(n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    codes = np.arange(4 * 2 * 10, dtype=np.int32).reshape(8, 10)
    lens = np.full(8, 10, np.int32)
    gc, gl = global_read_batch(mesh, codes, lens)
    np.testing.assert_array_equal(np.asarray(gc), codes)
    np.testing.assert_array_equal(np.asarray(gl), lens)
