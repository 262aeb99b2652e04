"""maskplanner_tpu — a TPU-native (JAX/XLA/Pallas) framework for Object-Centric
Motion Generation (OCMG), providing the capabilities of the MaskPlanner reference
(gabrieletiboni/MaskPlanner) redesigned TPU-first.

Subpackages
-----------
- ``config``     : YAML config system with alias expansion and CLI overrides
                   (reference contract: ``utils/args.py``).
- ``ops``        : device-resident geometric kernels (masked chamfer, kNN, FPS,
                   ball query, Hungarian assignment) built on XLA + Pallas.
- ``models``     : Flax model zoo (PointNet++ SSG regressors, PointNet, DGCNN,
                   MLP, point transformer) and the model factory.
- ``losses``     : set-prediction loss registry (33 losses of the reference
                   ``loss_handler.py``), fully jit-compatible.
- ``metrics``    : evaluation metric registry (reference ``metrics_handler.py``).
- ``data``       : dataset/preprocessing pipeline with static-shape batching.
- ``train``      : training loop, LR/PSACD schedulers, orbax checkpointing.
- ``parallel``   : device-mesh / sharding utilities for multi-chip training.
- ``postprocess``: mask->stroke-id extraction, segment concatenation (Edmonds),
                   resampling/smoothing — host-side inference pipeline.
"""

__version__ = "0.1.0"
