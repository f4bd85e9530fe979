"""dexgangrasp_tpu — a TPU-native dexterous grasp-synthesis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``david-s-martinez/Dex-GAN-Grasp`` (DexGANGrasp, arXiv:2407.17348):

- ``core``     — rotation / transform / joint math and the ``Grasps`` pytree
- ``ops``      — Pallas TPU kernels (BPS encoding, chamfer distance, top-k)
- ``models``   — DexGenerator / DexDiscriminator / DexEvaluator networks
- ``engine``   — the fused encode→sample→score→filter inference program
- ``train``    — GAN + evaluator training (BCE & WGAN-GP) on device meshes
- ``data``     — dataset layer (grasp HDF5, BPS trees, synthetic data)
- ``eval``     — vectorized MAGD benchmark harness
- ``parallel`` — mesh / sharding helpers (dp over batch, tp over features)
- ``apps``     — host-side inference pipelines (offline, affordance, realtime)
- ``utils``    — config, logging, timing, visualization

Unlike the reference (PyTorch/CUDA, host-device round trips per stage), the
whole hot path here is a single jitted XLA program and scales across chips
via ``jax.sharding`` collectives.
"""

__version__ = "0.1.0"
