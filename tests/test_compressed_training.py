"""Compressed TFRecord end-to-end training (reference covers ZLIB/GZIP,
test_fixed_effect_lr_lbfgs_model.py:124)."""
import gzip
import os
import zlib

import numpy as np
import pytest

from gdmix_tpu import constants
from gdmix_tpu.models.fixed_effect_lr import FixedEffectLRModel

from tests.test_fixed_effect_lr import _make_dataset, _params, _scipy_fe_oracle


@pytest.mark.parametrize("suffix", [".gz", ".deflate"])
def test_train_on_compressed_files(tmp_path, suffix):
    ds = _make_dataset(tmp_path)
    src = os.path.join(ds["train_dir"], "data.tfrecord")
    with open(src, "rb") as f:
        raw = f.read()
    os.remove(src)
    out = src + suffix
    if suffix == ".gz":
        with gzip.open(out, "wb") as f:
            f.write(raw)
    else:
        with open(out, "wb") as f:
            f.write(zlib.compress(raw))

    model_params, base_params = _params(ds, tmp_path)
    model = FixedEffectLRModel(model_params, base_params)
    ctx = {constants.TASK_INDEX: 0, constants.NUM_WORKERS: 1,
           constants.IS_CHIEF: True}
    model.train(ds["train_dir"], None, ds["md_file"],
                model_params.output_model_dir, ctx, base_params)
    oracle = _scipy_fe_oracle(ds["X"], ds["y"], ds["offsets"], ds["weights"],
                              lam=0.7, regularize_bias=False)
    np.testing.assert_allclose(model.model_coefficients, oracle, atol=1e-6)
