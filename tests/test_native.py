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


# ---------------------------------------------------------------------------
# Adversarial inputs: the native parser consumes untrusted bytes with a
# hand-rolled proto walker — malformed framing and payloads must produce
# clean skips (ok count excludes them, zeroed outputs), never crashes.
# ---------------------------------------------------------------------------

def _frame(payload: bytes) -> bytes:
    """Valid TFRecord framing around an arbitrary (possibly bogus) payload."""
    import struct

    from multimodal_similarity_tpu.data.tfrecords import _masked_crc
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header))
            + payload + struct.pack("<I", _masked_crc(payload)))


def _good_record(rng, label=1, t=4, d=8) -> bytes:
    frames = rng.randn(t, d).astype(np.float32)
    return encode_sequence_example(
        {"label": label, "length": t, "session_id": "s", "event_id": 0},
        {"sensors": frames})


@needs_native
def test_native_rejects_malformed_inputs(tmp_path, rng):
    """Table of hostile files: every one must be skipped cleanly."""
    import struct

    from multimodal_similarity_tpu.data.tfrecords import _masked_crc

    good = _good_record(rng)
    header8 = struct.pack("<Q", 1 << 40)  # 1 TiB claim, CRC-valid header
    cases = {
        "empty": b"",
        "short": b"\x01\x02\x03",
        "garbage_no_framing": bytes(rng.bytes(64)),
        # framing CRC failures
        "bad_header_crc": struct.pack("<QI", len(good), 0xDEADBEEF)
            + good + struct.pack("<I", _masked_crc(good)),
        "bad_payload_crc": struct.pack("<Q", len(good))
            + struct.pack("<I", _masked_crc(struct.pack("<Q", len(good))))
            + good + struct.pack("<I", 0),
        # CRC-valid header claiming far more bytes than the file holds
        # (must not attempt a 1 TiB allocation)
        "oversized_length": header8
            + struct.pack("<I", _masked_crc(header8)) + b"xx",
        "truncated_payload": _frame(good)[: len(_frame(good)) // 2],
        # CRC-valid framing around protobuf garbage
        "crc_valid_garbage": _frame(bytes(rng.bytes(100))),
        # unterminated varint (10 continuation bytes)
        "malformed_varint": _frame(b"\xFF" * 10),
        # wire type 2 with length pointing past the payload end
        "overlong_field": _frame(b"\x0a\xff\x01" + b"z" * 4),
        # wire type 7 (invalid)
        "bad_wire_type": _frame(b"\x0f\x01"),
        # deeply nested length-delimited fields
        "deep_nesting": _frame(_nested(120)),
    }
    paths = []
    for name, blob in cases.items():
        p = str(tmp_path / f"{name}.tfrecords")
        with open(p, "wb") as f:
            f.write(blob)
        paths.append(p)
    # plus one genuinely missing file and one good file
    paths.append(str(tmp_path / "does_not_exist.tfrecords"))
    good_path = str(tmp_path / "good.tfrecords")
    write_tfrecord(good_path, [good])
    paths.append(good_path)

    out, seq_len, labels, ok = native_load_event_batch(
        paths, "sensors", max_time=8, feat_dim=8)
    # only the good file parses: "deep_nesting" is structurally valid
    # protobuf but carries no "sensors" FeatureList, and records without
    # the requested key are NOT counted ok (they defer to the Python
    # path, which raises a loud KeyError instead of yielding zeros)
    assert ok == 1
    # hostile rows are zeroed with the default seq_len/label
    for i in range(len(paths) - 1):
        assert labels[i] == 0, paths[i]
        np.testing.assert_array_equal(out[i], 0.0)
    assert labels[-1] == 1
    assert seq_len[-1] == 4
    assert np.abs(out[-1][:4]).sum() > 0


def _nested(depth: int) -> bytes:
    """field 1, wire 2, nested `depth` levels deep."""
    body = b"\x08\x01"  # innermost: field 1 varint 1
    for _ in range(depth):
        out = bytearray()
        out += b"\x0a"
        # varint length
        n = len(body)
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | (0x80 if n else 0))
            if not n:
                break
        out += body
        body = bytes(out)
    return body


@needs_native
def test_native_truncated_float_list_is_safe(tmp_path, rng):
    """A float list whose byte length is not a multiple of 4 must not
    over-read (count floors) and still parses the rest of the record."""
    good = _good_record(rng, label=3, t=2, d=4)
    # append a feature_lists entry with a ragged float payload
    ragged = b"\x12\x09\x0a\x07\x12\x05\x0a\x03abc"
    blob = _frame(good + ragged)
    p = str(tmp_path / "ragged.tfrecords")
    with open(p, "wb") as f:
        f.write(blob)
    out, seq_len, labels, ok = native_load_event_batch(
        [p], "sensors", max_time=4, feat_dim=4)
    assert ok == 1
    assert labels[0] == 3


@needs_native
def test_native_defers_on_missing_key_and_width_mismatch(tmp_path, rng):
    """Records whose requested FeatureList is absent, or whose on-disk
    frame width differs from feat_dim, must NOT count as ok — the loader
    then falls back to the Python path, which fails loudly (KeyError /
    broadcast error) instead of yielding silently-zero or frame-misaligned
    batches."""
    frames = rng.randn(4, 16).astype(np.float32)
    rec = encode_sequence_example({"label": 2, "length": 4},
                                  {"sensors": frames})
    p = str(tmp_path / "e.tfrecords")
    write_tfrecord(p, [rec])

    # missing key
    out, seq_len, labels, ok = native_load_event_batch(
        [p], "resnet", max_time=4, feat_dim=16)
    assert ok == 0
    np.testing.assert_array_equal(out, 0.0)

    # width mismatch: on-disk 16-wide frames, loader configured for 8
    out, seq_len, labels, ok = native_load_event_batch(
        [p], "sensors", max_time=8, feat_dim=8)
    assert ok == 0

    # exact width still parses
    _, _, labels, ok = native_load_event_batch(
        [p], "sensors", max_time=4, feat_dim=16)
    assert ok == 1 and labels[0] == 2


def _session_fixture(tmp_path, rng, T=120, dim=6):
    """One on-contract session: features npy + label pkl with 4 events."""
    import pickle

    feats = rng.randn(T, dim).astype(np.float32)
    feat_path = str(tmp_path / "sess.npy")
    np.save(feat_path, feats)
    # segments: background(20) ev(25) short(3) ev(30) bg-short(10) ev(32)
    s = np.cumsum([0, 20, 25, 3, 30, 10, 32])
    G = [0, 3, 5, 7, 0, 2]
    label_path = str(tmp_path / "sess_goal.pkl")
    with open(label_path, "wb") as f:
        pickle.dump({"label": None, "s": s, "G": G}, f)
    return feat_path, label_path


@needs_native
def test_load_data_and_label_native_matches_python(tmp_path, rng):
    """The TSN native gather fast path is bit-identical to the Python
    window path — same events, labels, boundaries, AND the same RNG
    stream afterwards (eligibility is decided before any draw)."""
    import functools
    from unittest import mock

    from multimodal_similarity_tpu.data.datasets import load_data_and_label
    from multimodal_similarity_tpu.data.tsn import (
        tsn_prepare_input, tsn_prepare_input_test)

    feat_path, label_path = _session_fixture(tmp_path, rng)

    # train-time sampling, loader-style partial-with-rng binding
    rng_a = np.random.RandomState(7)
    prep_a = functools.partial(
        functools.partial(tsn_prepare_input, 3), rng=rng_a)
    ev_n, lab_n, bou_n = load_data_and_label(feat_path, label_path, prep_a)

    rng_b = np.random.RandomState(7)
    prep_b = functools.partial(
        functools.partial(tsn_prepare_input, 3), rng=rng_b)
    with mock.patch(
            "multimodal_similarity_tpu.data.datasets."
            "_load_events_tsn_native", return_value=None):
        ev_p, lab_p, bou_p = load_data_and_label(feat_path, label_path,
                                                 prep_b)

    np.testing.assert_array_equal(ev_n, ev_p)
    np.testing.assert_array_equal(lab_n, lab_p)
    assert [tuple(map(int, b)) for b in bou_n] == \
        [tuple(map(int, b)) for b in bou_p]
    # RNG streams consumed identically
    assert rng_a.randint(1 << 30) == rng_b.randint(1 << 30)

    # test-time (deterministic) sampling parity
    prep_t = functools.partial(tsn_prepare_input_test, 3)
    ev_tn, _, _ = load_data_and_label(feat_path, label_path, prep_t)
    with mock.patch(
            "multimodal_similarity_tpu.data.datasets."
            "_load_events_tsn_native", return_value=None):
        ev_tp, _, _ = load_data_and_label(feat_path, label_path, prep_t)
    np.testing.assert_array_equal(ev_tn, ev_tp)


@needs_native
def test_gather_segments_bounds_check(rng):
    feats = rng.randn(10, 4).astype(np.float32)
    with pytest.raises(IndexError):
        native_gather_segments(feats, np.array([8], np.int64),
                               np.array([[0, 1, 5]], np.int64))
    with pytest.raises(IndexError):
        native_gather_segments(feats, np.array([-2], np.int64),
                               np.array([[0, 1, 1]], np.int64))


@needs_native
def test_crc_python_table_matches_native(rng, monkeypatch):
    """crc32c() now prefers the native library; pin the pure-Python table
    fallback against it (and the RFC 3720 test vector) so both encodings
    stay interchangeable on machines without the .so."""
    from multimodal_similarity_tpu.data import tfrecords as tfr

    blobs = [b"", b"123456789", rng.bytes(4096)]
    native_vals = [tfr.crc32c(b) for b in blobs]
    monkeypatch.setattr(tfr, "_NATIVE_CRC", False)
    python_vals = [tfr.crc32c(b) for b in blobs]
    assert native_vals == python_vals
    assert python_vals[1] == 0xE3069283  # RFC 3720 check value
