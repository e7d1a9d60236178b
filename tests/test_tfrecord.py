"""TFRecord container + SequenceExample codec tests (SURVEY.md §4.1).

Includes an interop check against TensorFlow's own serialization: TF is
allowed in tests/offline tooling only, never in the training path
(SURVEY §7.0).
"""

import os

import numpy as np
import pytest

from avsr_tpu.data import proto, tfrecord
from avsr_tpu.data.synthetic import SyntheticSpec, Utterance, generate


def test_container_roundtrip(tmp_path):
    payloads = [b"alpha", b"bravo" * 100, b"", b"\x00\xff" * 33]
    path = str(tmp_path / "t.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    got = list(tfrecord.iter_records(path))
    assert got == payloads


def test_container_detects_corruption(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(b"payload-data-here")
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        list(tfrecord.iter_records(path))


def test_utterance_roundtrip():
    utts = generate(SyntheticSpec(num_utterances=3, seed=7))
    for u in utts:
        data = tfrecord.utterance_to_bytes(u)
        v = tfrecord.utterance_from_bytes(data)
        assert v.uid == u.uid and v.transcript == u.transcript
        np.testing.assert_allclose(v.waveform, u.waveform, rtol=1e-6)
        np.testing.assert_allclose(v.video, u.video, rtol=1e-6)
        np.testing.assert_allclose(v.au, u.au, rtol=1e-6)


def test_video_uint8_quantized_storage():
    """video_codec='uint8' is an explicit writer opt-in: stores [0,1] crops
    4x smaller, round-trips within quantization error, and rejects
    out-of-range values; the default codec is bit-exact float32."""
    rng = np.random.default_rng(4)
    vid01 = rng.random((5, 8, 8, 1)).astype(np.float32)
    u = Utterance(uid="q", transcript="a", video=vid01)
    blob = tfrecord.utterance_to_bytes(u, video_codec="uint8")
    v = tfrecord.utterance_from_bytes(blob)
    np.testing.assert_allclose(v.video, vid01, atol=1.0 / 255.0 + 1e-6)
    # the default codec stores the same video bit-exactly (and larger)
    blob_f32 = tfrecord.utterance_to_bytes(u)
    v_f32 = tfrecord.utterance_from_bytes(blob_f32)
    np.testing.assert_array_equal(v_f32.video, vid01)
    assert len(blob) < len(blob_f32)
    # uint8 refuses out-of-range video instead of silently switching codecs
    u2 = Utterance(uid="q2", transcript="a", video=vid01 - 0.5)
    with pytest.raises(ValueError):
        tfrecord.utterance_to_bytes(u2, video_codec="uint8")
    v2 = tfrecord.utterance_from_bytes(tfrecord.utterance_to_bytes(u2))
    np.testing.assert_array_equal(v2.video, vid01 - 0.5)


def test_dataset_file_roundtrip(tmp_path):
    utts = generate(SyntheticSpec(num_utterances=4, seed=3))
    path = str(tmp_path / "d.tfrecord")
    tfrecord.write_dataset(utts, path)
    got = tfrecord.read_dataset(path)
    assert [g.uid for g in got] == [u.uid for u in utts]
    np.testing.assert_allclose(got[2].waveform, utts[2].waveform, rtol=1e-6)


def test_proto_feature_roundtrip():
    cases = [
        [b"ab", b"", b"xyz"],
        [1.5, -2.25, 0.0],
        [0, -1, 1, 2**40, -(2**40)],
        [],
    ]
    for v in cases:
        got = proto.decode_feature(proto.encode_feature(v))
        if v and isinstance(v[0], float):
            assert got == pytest.approx(v)
        else:
            assert got == v


def test_sequence_example_tf_interop():
    tf = pytest.importorskip("tensorflow")
    context = {"uid": [b"u1"], "n": [42], "x": [1.5, 2.5]}
    fls = {"frames": [[1.0, 2.0], [3.0, 4.0]], "tags": [[b"a"], [b"b"]]}
    blob = proto.encode_sequence_example(context, fls)
    # TF must parse our bytes
    se = tf.train.SequenceExample.FromString(blob)
    assert se.context.feature["uid"].bytes_list.value[0] == b"u1"
    assert se.context.feature["n"].int64_list.value[0] == 42
    assert list(
        se.feature_lists.feature_list["frames"].feature[1].float_list.value
    ) == [3.0, 4.0]
    # We must parse TF's bytes
    ctx2, fls2 = proto.decode_sequence_example(se.SerializeToString())
    assert ctx2["uid"] == [b"u1"]
    assert ctx2["n"] == [42]
    assert fls2["frames"] == [[1.0, 2.0], [3.0, 4.0]]
    assert fls2["tags"] == [[b"a"], [b"b"]]


def test_proto_hostile_wire_rejected():
    """Hostile/corrupt proto payloads must raise, not hang or silently
    truncate (framing CRCs are attacker-computable)."""
    # length varint = 2**64 - 11: signed reinterpretation would move the
    # parse position BACKWARD -> infinite loop in _iter_fields
    huge_len = b"\x0a\xf5\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    with pytest.raises(ValueError):
        list(proto._iter_fields(huge_len))
    # unbounded continuation bytes (no terminator within 10 bytes)
    with pytest.raises(ValueError):
        list(proto._iter_fields(b"\x80" * 64))
    # declared length overruns the buffer: must raise, not yield the
    # Python-clamped short slice (silently truncated feature data)
    overrun = b"\x0a\x7f" + b"x" * 4
    with pytest.raises(ValueError, match="overruns"):
        list(proto._iter_fields(overrun))
    # truncated fixed32
    with pytest.raises(ValueError, match="truncated"):
        list(proto._iter_fields(b"\x0d\x01\x02"))
    # negative int64 values still round-trip (signed VALUE semantics)
    assert proto.decode_feature(proto.encode_feature([-5, 3])) == [-5, 3]


def test_encode_feature_numpy_ints_and_unknown_types():
    """np int arrays/scalars encode as Int64List; unencodable element
    types raise instead of silently writing an empty BytesList."""
    assert proto.decode_feature(
        proto.encode_feature(np.array([1, 2, 3], np.int64))
    ) == [1, 2, 3]
    assert proto.decode_feature(
        proto.encode_feature([np.int64(7), np.int64(-1)])
    ) == [7, -1]
    got = proto.decode_feature(proto.encode_feature([np.float32(0.5)]))
    assert got == pytest.approx([0.5])
    with pytest.raises(TypeError):
        proto.encode_feature([object()])
    with pytest.raises(TypeError):
        proto.encode_feature(np.array([b"x"], dtype=object))


def test_native_index_trailing_garbage_matches_python():
    """Trailing junk after the last record must be rejected by BOTH the
    native and pure-Python index paths (corruption detection must not
    depend on whether the native library built)."""
    from avsr_tpu import native
    from avsr_tpu.data.tfrecord import frame_record

    if not native.available():
        pytest.skip("native library unavailable")
    buf = b"".join(frame_record(b"") for _ in range(4)) + b"\x01\x02"
    with pytest.raises(ValueError):
        native.tfrecord_index(buf, verify=True)


def test_native_index_rejects_hostile_length():
    """A crafted header whose length field would wrap uint64 arithmetic
    (pos + 12 + len + 4) must be rejected by the native indexer, not read
    out of bounds (advisor finding, native/avsr_native.cc bounds check)."""
    import struct

    from avsr_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    # valid length-crc over a hostile length close to 2**64
    hostile_len = (1 << 64) - 8
    header = struct.pack("<Q", hostile_len)
    frame = header + struct.pack("<I", native.masked_crc32c(header))
    buf = frame + b"\x00" * 64
    with pytest.raises(ValueError, match="corrupt"):
        native.tfrecord_index(buf, verify=True)
    with pytest.raises(ValueError, match="corrupt"):
        native.tfrecord_index(buf, verify=False)
