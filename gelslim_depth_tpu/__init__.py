"""gelslim_depth_tpu — a TPU-native (JAX/XLA/Pallas) tactile-depth framework.

A from-scratch rebuild of the capability set of MMintLab/gelslim_depth
(reference mounted read-only at /root/reference), designed TPU-first:

- Stateless image/normalization ops as pure jittable functions
  (reference: gelslim_depth/processing_utils/*.py).
- A functional U-Net (params as pytrees, NHWC layout, bf16-capable compute
  with f32 accumulation) (reference: gelslim_depth/models/unet.py).
- An HBM-resident baked data pipeline replacing the eager torch Dataset
  (reference: gelslim_depth/datasets/general_dataset.py).
- A pure-functional jitted training step (Adam + EMA + MSE) with the
  reference's validation-SMA early stop and best-val checkpoint policy
  (reference: train_utils/train_unet.py).
- A vectorized mesh->depth ground-truth renderer replacing SciPy
  griddata scattered interpolation (reference:
  gelslim_depth/mesh_utils/depth_from_mesh.py).
- Data-parallel scaling via jax.sharding.Mesh + NamedSharding, not
  device strings.
"""

__version__ = "0.1.0"
