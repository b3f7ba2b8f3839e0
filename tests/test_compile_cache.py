"""Persistent XLA compilation cache wiring (gdmix_tpu.__init__).

The reference has no analog (TF1 graphs rebuild per process); on gdmix-tpu a
cold run is compile-bound, so the package enables jax's persistent cache by
default on TPU backends and honors GDMIX_TPU_COMPILE_CACHE everywhere.
"""
import os
import subprocess
import sys

_PROBE = ("import gdmix_tpu, jax; "
          "print('CACHE=%s' % jax.config.jax_compilation_cache_dir)")


def _probe(tmp_path, **env_overrides):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("GDMIX_TPU_COMPILE_CACHE", None)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env.update(env_overrides)
    out = subprocess.run([sys.executable, "-c", _PROBE], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_cpu_default_is_disabled(tmp_path):
    assert _probe(tmp_path) == "CACHE=None"


def test_explicit_path_enables_on_cpu(tmp_path):
    d = str(tmp_path / "xla")
    assert _probe(tmp_path, GDMIX_TPU_COMPILE_CACHE=d) == f"CACHE={d}"
    assert os.path.isdir(d)


def test_off_values_disable(tmp_path):
    assert _probe(tmp_path, GDMIX_TPU_COMPILE_CACHE="0") == "CACHE=None"
    assert _probe(tmp_path, GDMIX_TPU_COMPILE_CACHE="off") == "CACHE=None"


def test_existing_jax_setting_wins(tmp_path):
    d = str(tmp_path / "theirs")
    os.makedirs(d)
    got = _probe(tmp_path, JAX_COMPILATION_CACHE_DIR=d,
                 GDMIX_TPU_COMPILE_CACHE=str(tmp_path / "ours"))
    assert got == f"CACHE={d}"
    assert not os.path.exists(str(tmp_path / "ours"))


def test_cache_populates_and_run_matches(tmp_path):
    """Two fresh processes: the second must produce identical output with the
    cache directory populated by the first."""
    d = str(tmp_path / "xla")
    prog = ("import gdmix_tpu, jax, jax.numpy as jnp; "
            "print(jax.jit(lambda x: (x @ x.T).sum())"
            "(jnp.arange(64.0).reshape(8, 8)))")
    outs = []
    for _ in range(2):
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   GDMIX_TPU_COMPILE_CACHE=d,
                   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0")
        r = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout.strip())
    assert outs[0] == outs[1]
    assert os.listdir(d), "cache directory should hold at least one entry"
