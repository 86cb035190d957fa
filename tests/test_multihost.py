"""Single-process path of the multihost helpers (the multi-process entry
points follow the standard jax.distributed recipe; here we validate the mesh
assembly + global batch construction on the virtual device pool)."""

import jax
import numpy as np
import os
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


def test_stitch_rle_shards_equals_global_rle():
    """Sharded RLE + boundary stitch == RLE of the whole row array, for
    random splits including empty shards and runs spanning whole shards."""
    from pangenome_index_tpu.core.tagbuild import rle
    from pangenome_index_tpu.parallel.multihost import stitch_rle_shards

    rng = np.random.default_rng(3)
    values = rng.integers(0, 4, 500).astype(np.int64)
    want_v, want_l = rle(values)
    for trial in range(20):
        cuts = np.sort(rng.integers(0, len(values) + 1, size=rng.integers(1, 8)))
        bounds = [0, *cuts.tolist(), len(values)]
        shards = [rle(values[a:b]) for a, b in zip(bounds[:-1], bounds[1:])]
        got_v, got_l = stitch_rle_shards(shards)
        np.testing.assert_array_equal(got_v, want_v)
        np.testing.assert_array_equal(got_l, want_l)


def test_stitch_rle_shards_empty():
    from pangenome_index_tpu.parallel.multihost import stitch_rle_shards

    v, l = stitch_rle_shards([])
    assert len(v) == 0 and len(l) == 0


def test_two_process_distributed_serving(tmp_path):
    """REAL two-process jax.distributed run (gloo CPU collectives, local
    coordinator): the model-sharded ckpt serving step over a global mesh
    spanning both processes, each verifying its local shards against a
    single-device reference."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"w{i}.txt") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(port), str(i), "2", outs[i]],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
        for i in range(2)]
    errs = [p.communicate(timeout=300)[1] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, errs[i].decode(errors="replace")[-2000:]
    for o in outs:
        with open(o) as fh:
            assert fh.read() == "OK"
