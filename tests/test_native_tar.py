"""Native C++ tar indexer: build a synthetic nested ImageNet-style tar and
verify the index matches the pure-Python scanner byte for byte."""

import io
import os
import tarfile

import numpy as np
import pytest


def _make_nested_tar(path, n_classes=3, per_class=4):
    """Outer tar of <class>.tar members, each with <class>_<i>.JPEG files."""
    rng = np.random.default_rng(0)
    inner_blobs = {}
    for c in range(n_classes):
        cls = f"n{c:08d}"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as inner:
            for i in range(per_class):
                data = rng.bytes(rng.integers(100, 3000))
                info = tarfile.TarInfo(f"{cls}_{i}.JPEG")
                info.size = len(data)
                inner.addfile(info, io.BytesIO(data))
        inner_blobs[cls] = buf.getvalue()
    with tarfile.open(path, "w") as outer:
        for cls, blob in inner_blobs.items():
            info = tarfile.TarInfo(f"{cls}.tar")
            info.size = len(blob)
            outer.addfile(info, io.BytesIO(blob))


def test_native_index_matches_python(tmp_path):
    from bitdance_tpu.data.native import build_tar_index_native, native_available

    if not native_available():
        pytest.skip("g++ unavailable")

    tar_path = str(tmp_path / "train.tar")
    _make_nested_tar(tar_path)

    entries, classes = build_tar_index_native(tar_path,
                                              str(tmp_path / "idx"))
    assert len(classes) == 3
    assert len(entries) == 12

    # pure-python reference scan (the fallback path in imagenet.py)
    ref = []
    with tarfile.open(tar_path, "r:") as outer:
        for sub in outer.getmembers():
            if not sub.isfile() or not sub.name.endswith(".tar"):
                continue
            outer_off = sub.offset_data
            with tarfile.open(fileobj=outer.extractfile(sub), mode="r:") as inner:
                for m in inner.getmembers():
                    if m.isfile():
                        cat = m.name.split("_", 1)[0]
                        ref.append((outer_off + m.offset_data, m.size, cat))
    cats = sorted({c for _, _, c in ref})
    cat2idx = {c: i for i, c in enumerate(cats)}
    ref_flat = [(o, s, cat2idx[c]) for o, s, c in ref]

    assert [tuple(e) for e in entries] == ref_flat
    assert classes == cats

    # reading through the dataset actually returns the stored bytes
    off, size, _ = entries[0]
    with open(tar_path, "rb") as f:
        f.seek(off)
        data = f.read(size)
    assert len(data) == size


def test_dataset_uses_index(tmp_path):
    from bitdance_tpu.data.imagenet import build_flat_index

    tar_path = str(tmp_path / "train.tar")
    _make_nested_tar(tar_path, n_classes=2, per_class=2)
    flat = build_flat_index(tar_path, tar_path + ".index")
    assert len(flat) == 4
    labels = sorted({e[2] for e in flat})
    assert labels == [0, 1]
    # cached second call
    flat2 = build_flat_index(tar_path, tar_path + ".index")
    assert flat == flat2
