"""localrf_tpu — TPU-native progressive local radiance fields.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/localrf ("Progressively Optimized Local Radiance Fields for
Robust View Synthesis", CVPR 2023): joint progressive camera-pose + radiance
field optimization with dynamically allocated, blended local TensoRF-VM
fields, supervised by photometric, optical-flow and monocular-depth losses.

Design stance (not a port):
  * functional state — all parameters live in pytrees; training steps are
    pure jitted functions; the progressive state machine runs on host.
  * static shapes — fixed [n_views, n_px] ray batches, fixed samples/ray per
    coarse-to-fine stage (bucketed compiles, cached across local fields).
  * masked optimizers — the reference's per-frame torch.optim.Adam objects
    become stacked parameter arrays with per-frame gated Adam updates.
  * Pallas kernels for the hot gather/march path, pure-XLA reference
    implementations kept for correctness testing.
  * scaling via jax.sharding: ray-batch data parallelism over ICI.
"""

__version__ = "0.1.0"
