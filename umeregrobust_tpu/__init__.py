"""umeregrobust_tpu: a TPU-native LiDAR point-cloud rigid-registration framework.

Re-implements the full capability surface of UMERegRobust (ECCV 2024,
reference: yuvalH9/UMERegRobust) as an idiomatic JAX/XLA framework:

- ``core``     : rigid transforms, UME moment matrices, subspace distance,
                 closed-form rigid-transform estimation (jnp.linalg, vmap).
- ``ops``      : fixed-shape neighbor search (ball query / kNN), voxel
                 quantization, device hash tables, sparse 3D convolution
                 (gather-GEMM over cached kernel maps), ICP.
- ``models``   : the sparse ResUNet "coloring" family (flagship
                 ``ResUNetSmall2``) as functional param-pytree models.
- ``pipeline`` : matching, hypothesis generation, kernel-correlation
                 hypothesis scoring, end-to-end jittable registration.
- ``losses``   : pointwise InfoNCE, UME-contrastive, cube-registration.
- ``data``     : KITTI / nuScenes readers, metadata registry, SEM
                 (sampling-equalizer) preprocessing, fixed-shape collate.
- ``train``    : optax training loop, data-parallel pjit, checkpointing.
- ``parallel`` : device-mesh / sharding utilities (ICI-first).

All device code obeys the fixed-shape discipline: point clouds and voxel
sets are padded to static capacities and carried with validity masks, so
every stage of the pipeline compiles once and runs inside ``jax.jit``.
"""

__version__ = "0.1.0"
