"""Streaming scratch-dir lifecycle: tmpfs free-space bound and
end-of-process cleanup (streaming/run.py scratch_dir)."""

from __future__ import annotations

import os
import tempfile

from flink_1_12_0_src_spark.streaming import run as srun


def test_scratch_dir_registers_for_cleanup():
    d = srun.scratch_dir(prefix="scratch_test_")
    assert os.path.isdir(d)
    assert d in srun._ALLOCATED
    srun._cleanup_scratch()
    assert not os.path.exists(d)
    assert srun._ALLOCATED == []


def test_scratch_dir_falls_back_to_disk_when_tmpfs_low(monkeypatch):
    """When the RAM-backed root's free space is under the bound, new dirs
    land in the disk-backed tempfile default instead."""
    if srun._SCRATCH_ROOT is None:
        return  # no tmpfs on this host — the fallback IS the default path
    monkeypatch.setattr(srun, "_MIN_FREE_BYTES", 2**62)  # bound nothing can meet
    d = srun.scratch_dir(prefix="scratch_test_low_")
    try:
        assert not d.startswith(srun._SCRATCH_ROOT + os.sep)
        assert d.startswith(tempfile.gettempdir())
        assert os.path.isdir(d)
    finally:
        srun._cleanup_scratch()
    assert not os.path.exists(d)


def test_scratch_dir_uses_tmpfs_when_space_available():
    if srun._SCRATCH_ROOT is None:
        return
    st = os.statvfs(srun._SCRATCH_ROOT)
    if st.f_bavail * st.f_frsize < srun._MIN_FREE_BYTES:
        return  # host tmpfs genuinely low — nothing to assert
    d = srun.scratch_dir(prefix="scratch_test_hi_")
    try:
        assert d.startswith(srun._SCRATCH_ROOT + os.sep)
    finally:
        srun._cleanup_scratch()
