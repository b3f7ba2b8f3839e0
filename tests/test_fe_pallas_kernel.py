"""Fused Pallas FE loss/grad kernel: interpret-mode correctness vs the scatter
objective (compiled-path parity is asserted on real TPU in /tmp scratch runs;
see the kernel docstring for measured numbers)."""
import jax.numpy as jnp
import numpy as np
import pytest

from gdmix_tpu.ops.logistic import SparseBatch, fixed_effect_value_and_grad
from gdmix_tpu.ops.pallas.fe_grad import TILE, fe_loss_grad_pallas


@pytest.mark.parametrize("linear", [False, True])
def test_matches_scatter_objective(linear):
    N, D, K = 2 * TILE, 96, 4
    rng = np.random.RandomState(0)
    idx = rng.randint(0, D, (N, K)).astype(np.int32)
    val = (rng.randn(N, K) * (rng.rand(N, K) < 0.7)).astype(np.float64)
    y = (rng.randint(0, 2, N).astype(np.float64) if not linear
         else rng.randn(N))
    w = rng.rand(N) + 0.5
    off = 0.3 * rng.randn(N)
    x = rng.randn(D + 1) * 0.2

    batch = SparseBatch(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(off),
                        jnp.asarray(y), jnp.asarray(w))
    v_ref, g_ref = fixed_effect_value_and_grad(
        jnp.asarray(x), batch, D, regularize_bias=True, l2_reg_weight=0.0,
        model_type="linear_regression" if linear else "logistic_regression")
    v, g = fe_loss_grad_pallas(
        jnp.asarray(x, jnp.float32), jnp.asarray(idx), jnp.asarray(val),
        jnp.asarray(y), jnp.asarray(w), jnp.asarray(off), D, linear=linear,
        interpret=True)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g, np.float64), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_padding_rows_inert():
    N, D, K = TILE, 32, 4
    rng = np.random.RandomState(1)
    idx = rng.randint(0, D, (N, K)).astype(np.int32)
    val = rng.randn(N, K)
    y = rng.randint(0, 2, N).astype(np.float64)
    w = np.ones(N)
    w[N // 2:] = 0.0   # padding rows
    off = np.zeros(N)
    x = rng.randn(D + 1) * 0.1

    v1, g1 = fe_loss_grad_pallas(jnp.asarray(x, jnp.float32), jnp.asarray(idx),
                                 jnp.asarray(val), jnp.asarray(y),
                                 jnp.asarray(w), jnp.asarray(off), D,
                                 interpret=True)
    # same first half without padding rows → identical results
    h = N // 2
    pad = TILE - h
    def padded(a, fill=0.0):
        return np.concatenate([a[:h], np.full((pad,) + a.shape[1:], fill,
                                              a.dtype)])
    v2, g2 = fe_loss_grad_pallas(jnp.asarray(x, jnp.float32),
                                 jnp.asarray(padded(idx, 0).astype(np.int32)),
                                 jnp.asarray(padded(val)),
                                 jnp.asarray(padded(y)),
                                 jnp.asarray(padded(w)),
                                 jnp.asarray(padded(off)), D, interpret=True)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


@pytest.mark.parametrize("linear", [False, True])
def test_block_kernel_matches_scatter_objective(linear):
    from gdmix_tpu.ops.pallas.fe_block import fe_loss_grad_block_pallas
    TILE2, N, D, K = 1024, 2048, 300, 4   # D spans >2 lane blocks (A=3)
    rng = np.random.RandomState(2)
    idx = rng.randint(0, D, (N, K)).astype(np.int32)
    val = (rng.randn(N, K) * (rng.rand(N, K) < 0.7)).astype(np.float64)
    y = (rng.randint(0, 2, N).astype(np.float64) if not linear
         else rng.randn(N))
    w = rng.rand(N) + 0.5
    off = 0.3 * rng.randn(N)
    x = rng.randn(D + 1) * 0.2

    batch = SparseBatch(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(off),
                        jnp.asarray(y), jnp.asarray(w))
    v_ref, g_ref = fixed_effect_value_and_grad(
        jnp.asarray(x), batch, D, regularize_bias=True, l2_reg_weight=0.0,
        model_type="linear_regression" if linear else "logistic_regression")
    v, g = fe_loss_grad_block_pallas(
        jnp.asarray(x, jnp.float32), jnp.asarray(idx), jnp.asarray(val),
        jnp.asarray(y), jnp.asarray(w), jnp.asarray(off), D, linear=linear,
        tile=TILE2, interpret=True)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g, np.float64), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_block_kernel_padding_rows_inert():
    from gdmix_tpu.ops.pallas.fe_block import fe_loss_grad_block_pallas
    N, D, K = 1024, 160, 3
    rng = np.random.RandomState(3)
    idx = rng.randint(0, D, (N, K)).astype(np.int32)
    val = rng.randn(N, K)
    y = rng.randint(0, 2, N).astype(np.float64)
    w = np.ones(N)
    w[N // 2:] = 0.0
    # padding rows carry value 0 too (the project convention)
    val[N // 2:] = 0.0
    off = np.zeros(N)
    x = rng.randn(D + 1) * 0.1

    v1, g1 = fe_loss_grad_block_pallas(
        jnp.asarray(x, jnp.float32), jnp.asarray(idx), jnp.asarray(val),
        jnp.asarray(y), jnp.asarray(w), jnp.asarray(off), D, interpret=True)
    h = N // 2
    batch = SparseBatch(jnp.asarray(idx[:h]), jnp.asarray(val[:h]),
                        jnp.asarray(off[:h]), jnp.asarray(y[:h]),
                        jnp.asarray(w[:h]))
    v_ref, g_ref = fixed_effect_value_and_grad(
        jnp.asarray(x), batch, D, regularize_bias=True, l2_reg_weight=0.0)
    np.testing.assert_allclose(float(v1), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1, np.float64), np.asarray(g_ref),
                               atol=1e-4)


def test_model_grad_mode_pallas_block(tmp_path):
    """End-to-end FE training with grad_mode=pallas_block (interpret on CPU)
    must match the scipy oracle like the other modes."""
    from tests.test_fixed_effect_lr import (_make_dataset, _scipy_fe_oracle,
                                            _train)
    ds = _make_dataset(tmp_path)
    model = _train(ds, tmp_path, grad_mode="pallas_block", dtype="float32",
                   lbfgs_pgtol=1e-6)
    oracle = _scipy_fe_oracle(ds["X"], ds["y"], ds["offsets"], ds["weights"],
                              lam=0.7, regularize_bias=False)
    np.testing.assert_allclose(model.model_coefficients, oracle, atol=5e-3)


def test_model_grad_mode_pallas(tmp_path):
    """End-to-end FE training with grad_mode=pallas (interpret on CPU) must
    match the scipy oracle like the other modes."""
    from tests.test_fixed_effect_lr import (_make_dataset, _scipy_fe_oracle,
                                            _train)
    ds = _make_dataset(tmp_path)
    model = _train(ds, tmp_path, grad_mode="pallas", dtype="float32",
                   lbfgs_pgtol=1e-6)
    oracle = _scipy_fe_oracle(ds["X"], ds["y"], ds["offsets"], ds["weights"],
                              lam=0.7, regularize_bias=False)
    np.testing.assert_allclose(model.model_coefficients, oracle, atol=5e-3)


@pytest.mark.parametrize("linear", [False, True])
def test_gather_kernel_matches_scatter_objective(linear):
    from gdmix_tpu.ops.pallas.fe_gather import fe_loss_grad_gather_pallas
    TILE3, N, D, K = 512, 1024, 300, 4   # D spans >2 lane blocks (A=3)
    rng = np.random.RandomState(4)
    idx = rng.randint(0, D, (N, K)).astype(np.int32)
    val = (rng.randn(N, K) * (rng.rand(N, K) < 0.7)).astype(np.float64)
    y = (rng.randint(0, 2, N).astype(np.float64) if not linear
         else rng.randn(N))
    w = rng.rand(N) + 0.5
    off = 0.3 * rng.randn(N)
    x = rng.randn(D + 1) * 0.2

    batch = SparseBatch(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(off),
                        jnp.asarray(y), jnp.asarray(w))
    v_ref, g_ref = fixed_effect_value_and_grad(
        jnp.asarray(x), batch, D, regularize_bias=True, l2_reg_weight=0.0,
        model_type="linear_regression" if linear else "logistic_regression")
    v, g = fe_loss_grad_gather_pallas(
        jnp.asarray(x, jnp.float32), jnp.asarray(idx), jnp.asarray(val),
        jnp.asarray(y), jnp.asarray(w), jnp.asarray(off), D, linear=linear,
        tile=TILE3, interpret=True)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g, np.float64), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_gather_kernel_padding_rows_inert():
    from gdmix_tpu.ops.pallas.fe_gather import fe_loss_grad_gather_pallas
    N, D, K = 1024, 160, 3
    rng = np.random.RandomState(5)
    idx = rng.randint(0, D, (N, K)).astype(np.int32)
    val = rng.randn(N, K)
    y = rng.randint(0, 2, N).astype(np.float64)
    w = np.ones(N)
    w[N // 2:] = 0.0
    val[N // 2:] = 0.0   # padding rows carry value 0 (project convention)
    off = np.zeros(N)
    x = rng.randn(D + 1) * 0.1

    v1, g1 = fe_loss_grad_gather_pallas(
        jnp.asarray(x, jnp.float32), jnp.asarray(idx), jnp.asarray(val),
        jnp.asarray(y), jnp.asarray(w), jnp.asarray(off), D, tile=512,
        interpret=True)
    h = N // 2
    batch = SparseBatch(jnp.asarray(idx[:h]), jnp.asarray(val[:h]),
                        jnp.asarray(off[:h]), jnp.asarray(y[:h]),
                        jnp.asarray(w[:h]))
    v_ref, g_ref = fixed_effect_value_and_grad(
        jnp.asarray(x), batch, D, regularize_bias=True, l2_reg_weight=0.0)
    np.testing.assert_allclose(float(v1), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1, np.float64), np.asarray(g_ref),
                               atol=1e-4)


def test_model_grad_mode_pallas_gather(tmp_path):
    """End-to-end FE training with grad_mode=pallas_gather (interpret on CPU)
    must match the scipy oracle like the other modes."""
    from tests.test_fixed_effect_lr import (_make_dataset, _scipy_fe_oracle,
                                            _train)
    ds = _make_dataset(tmp_path)
    model = _train(ds, tmp_path, grad_mode="pallas_gather", dtype="float32",
                   lbfgs_pgtol=1e-6)
    oracle = _scipy_fe_oracle(ds["X"], ds["y"], ds["offsets"], ds["weights"],
                              lam=0.7, regularize_bias=False)
    np.testing.assert_allclose(model.model_coefficients, oracle, atol=5e-3)


@pytest.mark.parametrize("precision_name", ["high", "bf16x2"])
@pytest.mark.parametrize("linear", [False, True])
def test_flat_kernel_matches_scatter_objective(linear, precision_name):
    from gdmix_tpu.ops.pallas.fe_flat import fe_loss_grad_flat_pallas
    ETILE, N, D, K = 512, 1024, 300, 4   # e = 4096 entries, A=3 lane blocks
    rng = np.random.RandomState(6)
    idx = rng.randint(0, D, (N, K)).astype(np.int32)
    val = (rng.randn(N, K) * (rng.rand(N, K) < 0.7)).astype(np.float64)
    y = (rng.randint(0, 2, N).astype(np.float64) if not linear
         else rng.randn(N))
    w = rng.rand(N) + 0.5
    off = 0.3 * rng.randn(N)
    x = rng.randn(D + 1) * 0.2

    batch = SparseBatch(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(off),
                        jnp.asarray(y), jnp.asarray(w))
    v_ref, g_ref = fixed_effect_value_and_grad(
        jnp.asarray(x), batch, D, regularize_bias=True, l2_reg_weight=0.0,
        model_type="linear_regression" if linear else "logistic_regression")
    v, g = fe_loss_grad_flat_pallas(
        jnp.asarray(x, jnp.float32), jnp.asarray(idx), jnp.asarray(val),
        jnp.asarray(y), jnp.asarray(w), jnp.asarray(off), D, linear=linear,
        tile=ETILE, precision_name=precision_name, interpret=True)
    # bf16x2: exact two-term bf16 splits → ~2^-17 relative grad error
    tol = dict(rtol=1e-3, atol=1e-3) if precision_name == "bf16x2" \
        else dict(rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g, np.float64), np.asarray(g_ref),
                               **tol)


def test_flat_kernel_padding_rows_inert():
    from gdmix_tpu.ops.pallas.fe_flat import fe_loss_grad_flat_pallas
    N, D, K = 1024, 160, 4
    rng = np.random.RandomState(7)
    idx = rng.randint(0, D, (N, K)).astype(np.int32)
    val = rng.randn(N, K)
    y = rng.randint(0, 2, N).astype(np.float64)
    w = np.ones(N)
    w[N // 2:] = 0.0
    val[N // 2:] = 0.0   # padding rows carry value 0 (project convention)
    off = np.zeros(N)
    x = rng.randn(D + 1) * 0.1

    v1, g1 = fe_loss_grad_flat_pallas(
        jnp.asarray(x, jnp.float32), jnp.asarray(idx), jnp.asarray(val),
        jnp.asarray(y), jnp.asarray(w), jnp.asarray(off), D, tile=512,
        interpret=True)
    h = N // 2
    batch = SparseBatch(jnp.asarray(idx[:h]), jnp.asarray(val[:h]),
                        jnp.asarray(off[:h]), jnp.asarray(y[:h]),
                        jnp.asarray(w[:h]))
    v_ref, g_ref = fixed_effect_value_and_grad(
        jnp.asarray(x), batch, D, regularize_bias=True, l2_reg_weight=0.0)
    np.testing.assert_allclose(float(v1), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1, np.float64), np.asarray(g_ref),
                               atol=1e-4)


def test_model_grad_mode_pallas_flat(tmp_path):
    """End-to-end FE training with grad_mode=pallas_flat (interpret on CPU)
    must match the scipy oracle like the other modes."""
    from tests.test_fixed_effect_lr import (_make_dataset, _scipy_fe_oracle,
                                            _train)
    ds = _make_dataset(tmp_path)
    model = _train(ds, tmp_path, grad_mode="pallas_flat", dtype="float32",
                   lbfgs_pgtol=1e-6)
    oracle = _scipy_fe_oracle(ds["X"], ds["y"], ds["offsets"], ds["weights"],
                              lam=0.7, regularize_bias=False)
    np.testing.assert_allclose(model.model_coefficients, oracle, atol=5e-3)


def test_effective_grad_mode_auto_resolution():
    """auto resolves to the concrete strategy: block above
    block_min_features, onehot at/below (pallas_flat is strictly opt-in —
    its [E, 1] entry columns pad 128x in HBM at production batch sizes).
    Explicit modes pass through, except pallas kernels without an intercept
    (they need the fused intercept-last layout) resolve to scatter."""
    from gdmix_tpu.models.fixed_effect_lr import effective_grad_mode
    # auto: block above block_min_features, onehot at/below
    assert effective_grad_mode("auto", True, 10_000, 1024, 16384) == "block"
    assert effective_grad_mode("auto", True, 1024, 1024, 16384) == "onehot"
    assert effective_grad_mode("auto", False, 50, 1024, 16384) == "onehot"
    # degenerate config: past both ceilings -> hybrid (whose builder
    # degrades to scatter when the data has no hot set)
    assert effective_grad_mode("auto", True, 18_000, 20_000, 16384) \
        == "hybrid"
    # wide-D regime (VERDICT r3 task 4 + r4 task 1): block's O(D) cost
    # crosses the D-independent paths at the measured ~700k
    # (scripts/fe_wide_d.py) — past it auto takes the hot/cold hybrid
    # (scripts/fe_hybrid_probe*.py), which itself falls back to scatter on
    # hot-set-free data
    assert effective_grad_mode("auto", True, 100_000, 1024, 16384) == "block"
    assert effective_grad_mode("auto", True, 700_000, 1024, 16384) == "block"
    assert effective_grad_mode("auto", True, 700_001, 1024, 16384) \
        == "hybrid"
    assert effective_grad_mode("auto", True, 10_000_000, 1024, 16384) \
        == "hybrid"
    # the ceiling is a tunable (pin the parameter wiring)
    assert effective_grad_mode("auto", True, 2_000_000, 1024, 16384,
                               block_max_features=5_000_000) == "block"
    # segment is explicit-only (it never beats scatter on TPU: 2.15s flat)
    assert effective_grad_mode("segment", True, 10_000_000, 1024, 16384) \
        == "segment"
    # explicit modes are never overridden...
    for m in ("block", "onehot", "scatter", "hybrid", "pallas_flat"):
        assert effective_grad_mode(m, True, 10_000, 1024, 16384) == m
    # ...except pallas without an intercept, which falls back to scatter
    for m in ("pallas", "pallas_block", "pallas_gather", "pallas_flat"):
        assert effective_grad_mode(m, False, 10_000, 1024, 16384) == "scatter"


@pytest.mark.parametrize("model_type,has_intercept",
                         [("logistic_regression", True),
                          ("logistic_regression", False),
                          ("linear_regression", True)])
def test_pallas_hybrid_matches_reference(model_type, has_intercept):
    """The fused hot/cold hybrid (ops/pallas/fe_hybrid.py + XLA cold side)
    ≡ the plain scatter objective within two-term-bf16-split tolerance,
    with BOTH sides active on power-law ids (VERDICT r4 task 1)."""
    from gdmix_tpu.ops.logistic import (
        SparseBatch, build_hybrid_aux, fixed_effect_value_and_grad,
        fixed_effect_value_and_grad_hybrid_pallas)
    rng = np.random.RandomState(17)
    n, k, d, a = 512, 6, 300, 32
    u = rng.rand(n, k)
    idx = (np.minimum(np.exp(u * np.log(d)).astype(int), d) - 1) \
        .astype(np.int32)
    vals = rng.randn(n, k).astype(np.float32)
    vals[rng.rand(n, k) < 0.2] = 0.0
    batch = SparseBatch(jnp.asarray(idx), jnp.asarray(vals),
                        jnp.asarray(0.1 * rng.randn(n), jnp.float32),
                        jnp.asarray((rng.rand(n) < 0.5), jnp.float32),
                        jnp.asarray(rng.rand(n), jnp.float32))
    aux = build_hybrid_aux(batch.indices, batch.values, d, hot_features=a,
                           cold_max_frac=0.9)
    assert int(np.sum(np.asarray(aux.cold_val) != 0)) > 0
    dim = d + (1 if has_intercept else 0)
    x = jnp.asarray(rng.randn(dim) * 0.3, jnp.float32)
    v_ref, g_ref = fixed_effect_value_and_grad(
        x, batch, d, has_intercept=has_intercept, regularize_bias=True,
        l2_reg_weight=0.0, model_type=model_type)
    v_hp, g_hp = fixed_effect_value_and_grad_hybrid_pallas(
        x, batch, aux, d, has_intercept=has_intercept,
        model_type=model_type, tile=128, interpret=True)
    np.testing.assert_allclose(float(v_hp), float(v_ref), rtol=3e-5)
    scale = float(np.max(np.abs(np.asarray(g_ref))))
    np.testing.assert_allclose(np.asarray(g_hp), np.asarray(g_ref),
                               atol=3e-5 * scale)


def test_model_grad_mode_pallas_hybrid(tmp_path):
    """End-to-end FE training with grad_mode=pallas_hybrid (interpret on
    CPU) must match the scipy oracle like the other modes."""
    from tests.test_fixed_effect_lr import (_make_dataset, _scipy_fe_oracle,
                                            _train)
    ds = _make_dataset(tmp_path)
    model = _train(ds, tmp_path, grad_mode="pallas_hybrid", dtype="float32",
                   lbfgs_pgtol=1e-6, hot_features=6,
                   hybrid_cold_max_frac=1.0, block_chunk_size=128)
    oracle = _scipy_fe_oracle(ds["X"], ds["y"], ds["offsets"], ds["weights"],
                              lam=0.7, regularize_bias=False)
    np.testing.assert_allclose(model.model_coefficients, oracle, atol=5e-3)
