"""multimodal_clinical_tpu — a TPU-native multimodal-fusion research framework.

A from-scratch JAX/Flax/Optax/Pallas rebuild of the capabilities of the
reference suite "Multimodal Enfusion" (Nano1337/multimodal-clinical): joint
logit / probability fusion, per-modality ensembles, OGM-GE gradient
modulation, QMF quality-aware fusion, EMA logit calibration, and the eight
two/three-modality classification benchmarks — redesigned around XLA
compilation, SPMD device meshes, and on-device state (no host syncs in the
hot loop).

Design notes (vs. reference architecture):
  * The reference's five Lightning base classes (utils/BaseModel.py:15-1162)
    become five *step-function factories* producing jitted
    ``train_step(state, batch) -> (state, metrics)`` / ``eval_step`` pairs
    (engine/steps.py).
  * EMA calibration state (utils/EMA.py) and QMF per-sample History
    (existing_algos/QMF.py:12-68) live inside the TrainState pytree on
    device — eliminating the reference's per-step D2H transfers
    (BaseModel.py:84-85, QMF.py:23-29).
  * OGM-GE (existing_algos/OGM_GE.py:4-57) is a pure gradient transform
    between ``jax.grad`` and the optimizer update (algos/ogm_ge.py).
  * Parallelism: a named ``("data", "model")`` mesh with jit/pjit automatic
    partitioning (parallel/mesh.py); the reference is single-GPU only
    (utils/run_trainer.py:42).
"""

__version__ = "0.1.0"
