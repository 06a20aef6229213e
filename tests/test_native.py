"""Native C++ data path vs the pure-Python codec."""

import numpy as np
import pytest

from multimodal_similarity_tpu.data.native import (
    load_native, native_crc32c, native_gather_segments,
    native_load_event_batch)
from multimodal_similarity_tpu.data.tfrecords import (
    crc32c, encode_sequence_example, write_tfrecord)

needs_native = pytest.mark.skipif(load_native() is None,
                                  reason="no C++ toolchain available")


@needs_native
def test_native_crc_matches_python(rng):
    for blob in (b"", b"123456789", rng.bytes(1000)):
        assert native_crc32c(blob) == crc32c(blob)


@needs_native
def test_native_event_batch_matches_python(tmp_path, rng):
    paths = []
    want = []
    for i in range(6):
        t = int(rng.randint(3, 12))
        frames = rng.randn(t, 16).astype(np.float32)
        rec = encode_sequence_example(
            {"label": i % 3, "length": t, "session_id": "s", "event_id": i},
            {"sensors": frames})
        p = str(tmp_path / f"e{i}.tfrecords")
        write_tfrecord(p, [rec])
        paths.append(p)
        want.append((frames, t, i % 3))

    out, seq_len, labels, ok = native_load_event_batch(
        paths, "sensors", max_time=16, feat_dim=16)
    assert ok == 6
    for i, (frames, t, lab) in enumerate(want):
        assert seq_len[i] == t
        assert labels[i] == lab
        np.testing.assert_allclose(out[i, :t], frames)
        np.testing.assert_allclose(out[i, t:], 0.0)


@needs_native
def test_native_event_batch_rejects_corrupt(tmp_path, rng):
    rec = encode_sequence_example({"label": 1},
                                  {"sensors": rng.randn(4, 8)
                                   .astype(np.float32)})
    p = str(tmp_path / "c.tfrecords")
    write_tfrecord(p, [rec])
    blob = bytearray(open(p, "rb").read())
    blob[20] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    out, seq_len, labels, ok = native_load_event_batch(
        [p], "sensors", max_time=8, feat_dim=8)
    assert ok == 0
    np.testing.assert_allclose(out, 0.0)


@needs_native
def test_native_gather_segments(rng):
    feats = rng.randn(100, 8).astype(np.float32)
    starts = np.array([0, 30, 60], np.int64)
    offsets = np.array([[1, 5, 9], [0, 4, 8], [2, 6, 10]], np.int64)
    out = native_gather_segments(feats, starts, offsets)
    for e in range(3):
        for s in range(3):
            np.testing.assert_allclose(out[e, s],
                                       feats[starts[e] + offsets[e, s]])


@needs_native
def test_loader_native_path_matches_python(tmp_path, rng):
    """EventTFRecordLoader's native fast path produces the same batches as
    the pure-Python fallback."""
    from unittest import mock

    from multimodal_similarity_tpu.data.tfrecord_loader import (
        EventTFRecordLoader)

    paths = []
    for i in range(5):
        t = int(rng.randint(3, 9))
        rec = encode_sequence_example(
            {"label": i % 2, "length": t},
            {"sensors": rng.randn(t, 8).astype(np.float32)})
        p = str(tmp_path / f"s_{i:04d}.tfrecords")
        write_tfrecord(p, [rec])
        paths.append(p)

    loader = EventTFRecordLoader(paths, "sensors", 8, event_per_batch=5,
                                 max_time=16, shuffle=False)
    native_batch = next(iter(loader.epoch()))
    with mock.patch(
            "multimodal_similarity_tpu.data.native.native_load_event_batch",
            return_value=None):
        python_batch = next(iter(loader.epoch()))
    for k in ("features", "seq_len", "labels", "mask"):
        np.testing.assert_array_equal(native_batch[k], python_batch[k])
