"""Out-of-core FE ingestion: the bounded-memory chunk stream must train to the
same coefficients as the eager whole-shard load (the reference's streaming
per_record_input_fn contract, input_data_pipeline.py:129-220)."""
import os

import numpy as np
import pytest

from gdmix_tpu import constants
from gdmix_tpu.io.input_pipeline import (iter_per_record_chunks,
                                         load_per_record, write_per_record)
from gdmix_tpu.models.fixed_effect_lr import FixedEffectLRModel

from test_fixed_effect_lr import (D, N, _make_dataset, _params,
                                  _scipy_fe_oracle, _train)


def _split_into_two_files(ds):
    """Rewrite the single-file dataset as two files (cross-file chunking)."""
    data = load_per_record(ds["train_dir"], ds["metadata"], "global")
    cut = 70
    for which, (lo, hi) in enumerate([(0, cut), (cut, N)]):
        cols = {k: v[lo:hi] for k, v in data.columns.items()}
        ragged_idx = [data.indices[i, :data.nnz[i]] for i in range(lo, hi)]
        ragged_val = [data.values[i, :data.nnz[i]] for i in range(lo, hi)]
        write_per_record(os.path.join(ds["train_dir"], f"part-{which}.tfrecord"),
                         ds["metadata"], cols, "global", ragged_idx, ragged_val)
    os.remove(os.path.join(ds["train_dir"], "data.tfrecord"))


@pytest.mark.parametrize("use_native", [True, False])
def test_iter_chunks_matches_eager_load(tmp_path, use_native):
    ds = _make_dataset(tmp_path)
    _split_into_two_files(ds)
    eager = load_per_record(ds["train_dir"], ds["metadata"], "global")

    chunks = list(iter_per_record_chunks(ds["train_dir"], ds["metadata"],
                                         "global", chunk_rows=48,
                                         use_native=use_native))
    # exact-size chunks, only the last short; bounded memory per chunk
    assert [c.num_samples for c in chunks] == [48, 48, 24]

    row = 0
    for c in chunks:
        for name, col in c.columns.items():
            np.testing.assert_array_equal(col,
                                          eager.columns[name][row:row + c.num_samples])
        for i in range(c.num_samples):
            k = c.nnz[i]
            assert k == eager.nnz[row + i]
            np.testing.assert_array_equal(c.indices[i, :k],
                                          eager.indices[row + i, :k])
            np.testing.assert_allclose(c.values[i, :k],
                                       eager.values[row + i, :k])
            # padding stays inert: zero values beyond nnz
            assert np.all(c.values[i, k:] == 0.0)
        row += c.num_samples
    assert row == N


def test_iter_chunks_sample_level_sharding(tmp_path):
    # 1 file, 2 shards → sample-level fallback: every 2nd record, like
    # load_per_record's sample_level contract
    ds = _make_dataset(tmp_path)
    eager = load_per_record(ds["train_dir"], ds["metadata"], "global")
    for shard in (0, 1):
        got = list(iter_per_record_chunks(ds["train_dir"], ds["metadata"],
                                          "global", num_shards=2,
                                          shard_index=shard, chunk_rows=32))
        uids = np.concatenate([c.columns["uid"] for c in got])
        np.testing.assert_array_equal(uids, eager.columns["uid"][shard::2])


def test_train_streamed_matches_eager(tmp_path):
    ds = _make_dataset(tmp_path)
    _split_into_two_files(ds)
    eager = _train(ds, tmp_path)
    # chunk_rows gets padded up to the mesh multiple (8 dev * 8 = 64):
    # chunks of 64, 56 — exercises the short-last-chunk + device concat path
    streamed = _train(ds, tmp_path, stream_chunk_rows=16)
    np.testing.assert_allclose(streamed.model_coefficients,
                               eager.model_coefficients, atol=1e-9)
    oracle = _scipy_fe_oracle(ds["X"], ds["y"], ds["offsets"], ds["weights"],
                              lam=0.7, regularize_bias=False)
    np.testing.assert_allclose(streamed.model_coefficients, oracle, atol=1e-6)


def test_train_streamed_scores_align(tmp_path):
    # training scores come from the streamed device batch: uid↔row alignment
    # must hold across chunk boundaries (padding only at the global end)
    ds = _make_dataset(tmp_path)
    _split_into_two_files(ds)
    model_params, base_params = _params(ds, tmp_path, stream_chunk_rows=16)
    model = FixedEffectLRModel(model_params, base_params)
    ctx = {constants.TASK_INDEX: 0, constants.NUM_WORKERS: 1,
           constants.IS_CHIEF: True}
    model.train(model_params.training_data_dir, None, ds["md_file"],
                model_params.output_model_dir, ctx, base_params)
    from gdmix_tpu.io.scores import read_scores
    got = read_scores(base_params.training_score_dir, base_params)
    assert len(got["uid"]) == N
    w, b = model.model_coefficients[:-1], model.model_coefficients[-1]
    order = np.argsort(got["uid"])
    np.testing.assert_allclose(got["predictionScorePerCoordinate"][order],
                               ds["X"] @ w + b, atol=1e-5)


def test_predict_streamed_matches_eager(tmp_path):
    """Out-of-core inference (stream_chunk_rows > 0 in predict): chunked
    scoring must write the same scores the eager path writes — host RAM
    holds one data chunk plus O(N) score scalars (≡ the reference streaming
    scoring through tf.data batches)."""
    from gdmix_tpu.io.scores import read_scores
    ds = _make_dataset(tmp_path)
    _split_into_two_files(ds)
    model = _train(ds, tmp_path)
    ctx = {constants.TASK_INDEX: 0, constants.NUM_WORKERS: 1}

    model_params, base_params = _params(ds, tmp_path)
    eager_dir = os.path.join(ds["root"], "inf_eager")
    FixedEffectLRModel(model_params, base_params).predict(
        eager_dir, ds["train_dir"], ds["md_file"],
        model_params.output_model_dir, ctx, base_params)

    model_params, base_params = _params(ds, tmp_path, stream_chunk_rows=16)
    stream_dir = os.path.join(ds["root"], "inf_stream")
    FixedEffectLRModel(model_params, base_params).predict(
        stream_dir, ds["train_dir"], ds["md_file"],
        model_params.output_model_dir, ctx, base_params)

    want = read_scores(eager_dir, base_params)
    got = read_scores(stream_dir, base_params)
    ow, og = np.argsort(want["uid"]), np.argsort(got["uid"])
    np.testing.assert_array_equal(want["uid"][ow], got["uid"][og])
    np.testing.assert_allclose(got["predictionScore"][og],
                               want["predictionScore"][ow], atol=1e-6)
    np.testing.assert_allclose(got["predictionScorePerCoordinate"][og],
                               want["predictionScorePerCoordinate"][ow],
                               atol=1e-6)


def test_re_predict_streamed_matches_eager(tmp_path):
    """RE out-of-core inference (stream_chunk_entities > 0 in
    _predict_file): entity-chunked scoring writes the same scores as the
    eager path (model-less entities included — logits = offsets)."""
    from gdmix_tpu.io.scores import read_scores
    from tests.test_random_effect_lr import (_build_model, _make_groups,
                                             _write_dataset)
    groups, _ = _make_groups(num_entities=9, seed=21)
    md_file, train_dir, feature_file = _write_dataset(tmp_path, groups)
    model, base = _build_model(md_file, train_dir, feature_file, tmp_path)
    weights = model.fit_groups(groups, {}, base)
    # drop a model to exercise the zero-row path through both scorers
    weights = {k: v for i, (k, v) in enumerate(weights.items()) if i != 2}

    eager_out = str(tmp_path / "eager.avro")
    model._predict_file(os.path.join(train_dir, "active"), eager_out,
                        base, weights)
    s_model, s_base = _build_model(md_file, train_dir, feature_file,
                                   tmp_path, stream_chunk_entities=3)
    stream_out = str(tmp_path / "stream.avro")
    s_model._predict_file(os.path.join(train_dir, "active"), stream_out,
                          s_base, weights)
    want = read_scores(eager_out, base)
    got = read_scores(stream_out, base)
    ow, og = np.argsort(want["uid"]), np.argsort(got["uid"])
    np.testing.assert_array_equal(want["uid"][ow], got["uid"][og])
    np.testing.assert_allclose(got["predictionScore"][og],
                               want["predictionScore"][ow], atol=1e-9)
    np.testing.assert_allclose(
        got["predictionScorePerCoordinate"][og],
        want["predictionScorePerCoordinate"][ow], atol=1e-9)


def test_iter_chunks_gzip(tmp_path):
    # suffix-sniffed gzip streams through the chunker like the eager loader
    import gzip
    ds = _make_dataset(tmp_path)
    src = os.path.join(ds["train_dir"], "data.tfrecord")
    with open(src, "rb") as f:
        raw = f.read()
    with gzip.open(src + ".gz", "wb") as f:
        f.write(raw)
    os.remove(src)
    eager = load_per_record(ds["train_dir"], ds["metadata"], "global")
    chunks = list(iter_per_record_chunks(ds["train_dir"], ds["metadata"],
                                         "global", chunk_rows=48))
    assert sum(c.num_samples for c in chunks) == N == eager.num_samples
    np.testing.assert_array_equal(
        np.concatenate([c.columns["uid"] for c in chunks]),
        eager.columns["uid"])
