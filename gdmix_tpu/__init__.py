"""gdmix-tpu: a TPU-native generalized mixed-effect (GDMix-capability) training engine.

One JAX/XLA codebase providing blockwise coordinate descent over a global fixed-effect
model plus per-entity random-effect models, replacing the reference linkedin/gdmix
TF1 + scipy + Spark + Kubeflow stack. See DESIGN.md and SURVEY.md.
"""

__version__ = "0.1.0"

# Restore env-var authority over the jax platform selection. Some deployment
# images preload jax via sitecustomize and pin the platform list
# programmatically, which silently overrides JAX_PLATFORMS / JAX_ENABLE_X64 for
# every subprocess (e.g. jobs launched by workflow.distributed.execute_job_dag).
# If the user set those env vars, they win.
import os as _os  # noqa: E402

if "JAX_PLATFORMS" in _os.environ or "JAX_ENABLE_X64" in _os.environ:
    import jax as _jax  # noqa: E402

    if _os.environ.get("JAX_PLATFORMS"):
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    if _os.environ.get("JAX_ENABLE_X64"):
        _jax.config.update(
            "jax_enable_x64",
            _os.environ["JAX_ENABLE_X64"].lower() in ("1", "true", "yes"))
