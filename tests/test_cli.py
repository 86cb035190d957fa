"""CLI-level pipeline regression: run the real `panidx` commands end-to-end
and byte-compare every intermediate against the committed fixtures."""

import subprocess
import sys

import pytest

ENV_KEYS = ["PATH", "HOME"]


def run(args, tmp_path, check=True):
    import os

    env = {k: os.environ[k] for k in ENV_KEYS if k in os.environ}
    env["PYTHONPATH"] = str(tmp_path.parent.parent) if False else "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "pangenome_index_tpu.cli", *args],
        capture_output=True, env=env, cwd=tmp_path, timeout=300, check=check,
    )


@pytest.mark.slow
def test_full_pipeline_byte_equality(ref_data, tmp_path):
    ref = ref_data / "bidirectional_test"
    run(["extract-text", str(ref / "xy.gbz"), "-o", "xy.txt"], tmp_path)
    assert (tmp_path / "xy.txt").read_bytes() == (ref / "contigs_xy").read_bytes()

    run(["build-bwt", "xy.txt", "xy.rl_bwt"], tmp_path)
    assert (tmp_path / "xy.rl_bwt").read_bytes() == (ref / "contigs_xy.rl_bwt").read_bytes()

    run(["build-rindex", "xy.rl_bwt", "-o", "xy.ri", "--format", "legacy"], tmp_path)
    assert (tmp_path / "xy.ri").read_bytes() == (ref / "xy.ri").read_bytes()

    run(["build-tags", str(ref / "xy.gbz"), "xy.rl_bwt", "xy.tags"], tmp_path)
    assert (tmp_path / "xy.tags").read_bytes() == (ref / "xy_bidirectional.tags").read_bytes()

    run(["convert-tags", "xy.tags", "xy_c.tags"], tmp_path)
    assert (tmp_path / "xy_c.tags").read_bytes() == (ref / "xy_bidirectional_compressed.tags").read_bytes()

    out = run(["find-mems", "xy.ri", "xy_c.tags", str(ref / "test_reads.txt"),
               "3", "1", "--engine", "host"], tmp_path)
    text = out.stdout.decode()
    assert "Seq: 1" in text and "MEM START: 0, MEM END: 3 BWT START: 989 SIZE: 136" in text


def test_cli_error_paths(ref_data, tmp_path):
    r = run(["build-rindex", "missing.rl_bwt"], tmp_path, check=False)
    assert r.returncode == 1 and b"panidx:" in r.stderr
    r = run(["tags-check", "/bin/ls"], tmp_path, check=False)
    assert r.returncode == 1
