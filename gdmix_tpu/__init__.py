"""gdmix-tpu: a TPU-native generalized mixed-effect (GDMix-capability) training engine.

One JAX/XLA codebase providing blockwise coordinate descent over a global fixed-effect
model plus per-entity random-effect models, replacing the reference linkedin/gdmix
TF1 + scipy + Spark + Kubeflow stack. See DESIGN.md and SURVEY.md.
"""

__version__ = "0.1.0"
