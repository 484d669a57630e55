"""Filesystem layer: local + hdfs:// paths, download-with-cache, dist helpers.

Equivalent of utils/fs.py: hdfs:// detection and subprocess-backed ops
(utils/fs.py:83-341), download-with-cache where only one host downloads then
others wait (utils/fs.py:91-144 — barrier via a sentinel file + orbax
multihost sync when distributed), pickled listing cache.
"""

from __future__ import annotations

import os
import pickle
import shutil
import subprocess
import time


def is_hdfs_path(path: str) -> bool:
    return path.startswith("hdfs://")


def _hdfs(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(["hdfs", "dfs", *args], capture_output=True,
                          text=True, check=False)


def exists(path: str) -> bool:
    if is_hdfs_path(path):
        return _hdfs("-test", "-e", path).returncode == 0
    return os.path.exists(path)


def listdir(path: str) -> list[str]:
    if is_hdfs_path(path):
        out = _hdfs("-ls", path)
        files = []
        for line in out.stdout.splitlines():
            parts = line.split()
            if len(parts) >= 8:
                files.append(parts[-1])
        return files
    return [os.path.join(path, p) for p in sorted(os.listdir(path))]


def listdir_with_metafile(path: str, meta_name: str = ".listing.pkl") -> list[str]:
    """Cached listing (utils/fs.py:212-248)."""
    meta = os.path.join(path, meta_name) if not is_hdfs_path(path) else None
    if meta and os.path.exists(meta):
        with open(meta, "rb") as f:
            return pickle.load(f)
    files = listdir(path)
    if meta:
        try:
            with open(meta, "wb") as f:
                pickle.dump(files, f)
        except OSError:
            pass
    return files


def mkdir(path: str) -> None:
    if is_hdfs_path(path):
        _hdfs("-mkdir", "-p", path)
    else:
        os.makedirs(path, exist_ok=True)


def copy(src: str, dst: str) -> None:
    if is_hdfs_path(src) and not is_hdfs_path(dst):
        _hdfs("-get", src, dst)
    elif not is_hdfs_path(src) and is_hdfs_path(dst):
        _hdfs("-put", "-f", src, dst)
    elif is_hdfs_path(src):
        _hdfs("-cp", "-f", src, dst)
    else:
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)


def remove(path: str) -> None:
    if is_hdfs_path(path):
        _hdfs("-rm", "-r", "-f", path)
    elif os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.exists(path):
        os.remove(path)


def download(path: str, cache_dir: str = "/tmp/bitdance_cache",
             timeout_s: float = 600.0) -> str:
    """Fetch a remote path to local cache; only process 0 downloads, other
    processes wait on a sentinel (utils/fs.py:91-144's barrier pattern)."""
    if not is_hdfs_path(path):
        return path
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    local = os.path.join(cache_dir, os.path.basename(path))
    done = local + ".done"
    if jax.process_index() == 0:
        if not os.path.exists(done):
            copy(path, local)
            with open(done, "w") as f:
                f.write("ok")
    else:
        start = time.time()
        while not os.path.exists(done):
            if time.time() - start > timeout_s:
                raise TimeoutError(f"waiting for download of {path}")
            time.sleep(1.0)
    return local


def init_distributed() -> tuple[int, int]:
    """jax.distributed.initialize if env configured; returns (rank, world)."""
    import jax

    if "COORDINATOR_ADDRESS" in os.environ and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass
    return jax.process_index(), jax.process_count()
