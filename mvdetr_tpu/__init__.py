"""mvdetr_tpu — a TPU-native multiview geometric perception framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of MVDeTr
(hou-yz/MVDeTr, ACM MM'21): multiview pedestrian detection via per-view CNN
features, perspective projection onto a shared ground plane, shadow-transformer
fusion (multi-scale deformable attention), and BEV occupancy decoding — built
TPU-first (NHWC layouts, static shapes, pjit/shard_map sharding over a
(data, view) device mesh, Pallas kernels for the sampling hot paths).

Subpackages
-----------
- ``geometry``   camera calibration, homographies, reference ("shadow") maps
- ``data``       dataset adapters (Wildtrack / MultiviewX / synthetic), targets
- ``models``     backbone, heads, world-feature fusion modules, the MVDeTr model
- ``ops``        warp / deformable-attention / decode / NMS device ops
- ``train``      optimizer, schedules, train/eval loops, checkpointing
- ``evaluation`` CLEAR MODA/MODP metrics
- ``parallel``   mesh construction and sharding rules
"""

__version__ = "0.1.0"
