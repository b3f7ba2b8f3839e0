"""TFRecord + protobuf codec tests. TensorFlow is used strictly as an encode/decode
oracle to prove wire compatibility with the reference's tf.data pipelines."""
import numpy as np
import pytest

from gdmix_tpu.io import proto, tfrecord

tf = pytest.importorskip("tensorflow")


def _tf_example(features: dict) -> bytes:
    feats = {}
    for name, values in features.items():
        v0 = values[0] if values else 0.0
        if isinstance(v0, bytes):
            feats[name] = tf.train.Feature(bytes_list=tf.train.BytesList(value=values))
        elif isinstance(v0, float):
            feats[name] = tf.train.Feature(float_list=tf.train.FloatList(value=values))
        else:
            feats[name] = tf.train.Feature(int64_list=tf.train.Int64List(value=values))
    return tf.train.Example(
        features=tf.train.Features(feature=feats)).SerializeToString()


FEATURES = {
    "global_indices": [0, 7, 41],
    "global_values": [1.0, 0.5, -2.25],
    "uid": [123456789012345],
    "weight": [1.0],
    "response": [1],
    "title": [b"terminator  judgment day"],
    "neg": [-42],
}


def test_decode_example_matches_tf():
    payload = _tf_example(FEATURES)
    decoded = proto.decode_example(payload)
    assert decoded["global_indices"] == FEATURES["global_indices"]
    np.testing.assert_allclose(decoded["global_values"], FEATURES["global_values"],
                               rtol=1e-6)
    assert decoded["uid"] == FEATURES["uid"]
    assert decoded["response"] == [1]
    assert decoded["title"] == FEATURES["title"]
    assert decoded["neg"] == [-42]


def test_encode_example_parses_with_tf():
    payload = proto.encode_example(FEATURES)
    ex = tf.train.Example.FromString(payload)
    f = ex.features.feature
    assert list(f["global_indices"].int64_list.value) == FEATURES["global_indices"]
    np.testing.assert_allclose(list(f["global_values"].float_list.value),
                               FEATURES["global_values"], rtol=1e-6)
    assert list(f["neg"].int64_list.value) == [-42]
    assert list(f["title"].bytes_list.value) == FEATURES["title"]


def test_sequence_example_roundtrip_with_tf():
    context = {"user_id": [17], "weight_sum": [2.0]}
    sequence = {
        "per_user_indices": [[0, 7, 60], [34, 57]],
        "per_user_values": [[1.0, 2.0, 3.0], [1.0, 2.0]],
    }
    payload = proto.encode_sequence_example(context, sequence)
    se = tf.train.SequenceExample.FromString(payload)
    assert list(se.context.feature["user_id"].int64_list.value) == [17]
    fl = se.feature_lists.feature_list["per_user_indices"].feature
    assert [list(f.int64_list.value) for f in fl] == sequence["per_user_indices"]

    ctx2, seq2 = proto.decode_sequence_example(payload)
    assert ctx2["user_id"] == [17]
    assert seq2["per_user_indices"] == sequence["per_user_indices"]
    np.testing.assert_allclose(seq2["per_user_values"][0], [1.0, 2.0, 3.0])


@pytest.mark.parametrize("suffix,comp", [("", ""), (".gz", "GZIP"), (".deflate", "ZLIB")])
def test_tfrecord_file_read_by_tf(tmp_path, suffix, comp):
    """Files we write must be readable by TFRecordDataset (CRCs must be right)."""
    path = str(tmp_path / f"data.tfrecord{suffix}")
    payloads = [_tf_example({"v": [float(i)]}) for i in range(25)]
    tfrecord.write_tfrecords(path, payloads)
    ds = tf.data.TFRecordDataset(path, compression_type=comp)
    got = [t.numpy() for t in ds]
    assert got == payloads


@pytest.mark.parametrize("suffix", ["", ".gz", ".deflate"])
def test_tfrecord_read_tf_written(tmp_path, suffix):
    """Files TF writes must be readable by our reader."""
    path = str(tmp_path / f"data.tfrecord{suffix}")
    payloads = [_tf_example({"v": [float(i)], "i": [i]}) for i in range(10)]
    opts = {"": None, ".gz": "GZIP", ".deflate": "ZLIB"}[suffix]
    with tf.io.TFRecordWriter(path, options=opts) as w:
        for p in payloads:
            w.write(p)
    got = list(tfrecord.read_tfrecords(path, verify_crc=(suffix == "")))
    assert got == payloads


def test_crc32c_known_values():
    # RFC 3720 test vector: crc32c of 32 zero bytes
    assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tfrecord.crc32c(b"123456789") == 0xE3069283
