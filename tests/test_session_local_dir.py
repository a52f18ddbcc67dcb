"""spark.local.dir election: /dev/shm only with real capacity headroom.

Round-10 advice: Docker's default 64 MB /dev/shm would ENOSPC mid-shuffle
if elected unconditionally. The factory now checks statvfs free bytes
against a 4 GB floor and falls back to /tmp."""

from __future__ import annotations

import os

from data_ingestion_tool_spark import session as S


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/somewhere/else")
    assert S._default_local_dir() == "/somewhere/else"


def _fake_statvfs(free_bytes):
    class V:
        f_bavail = free_bytes // 4096
        f_frsize = 4096

    return lambda p: V()


def test_small_tmpfs_falls_back_to_tmp(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    monkeypatch.setattr(os, "statvfs", _fake_statvfs(64 * 1024**2))
    assert S._default_local_dir() == "/tmp"


def test_big_tmpfs_elected(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    monkeypatch.setattr(os, "statvfs", _fake_statvfs(32 * 1024**3))
    monkeypatch.setattr(os.path, "isdir", lambda p: True)
    assert S._default_local_dir() == "/dev/shm/spark-graft-local"


def test_statvfs_failure_falls_back(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)

    def boom(p):
        raise OSError("no statvfs")

    monkeypatch.setattr(os, "statvfs", boom)
    assert S._default_local_dir() == "/tmp"
