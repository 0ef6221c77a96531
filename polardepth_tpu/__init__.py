"""polardepth_tpu — TPU-native framework for supervised depth estimation from polarized images.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
kkaytekin/Supervised-Depth-Estimation-from-Polarized-Images (a PyTorch research
codebase forked from ManyDepth/Monodepth2 with polarization-specific additions).

Design stance (TPU-first, not a port):
  * All per-pixel polarization physics (Stokes XOLP fit, Fresnel normal priors)
    runs device-side inside the jitted step — the reference computes XOLP on
    host CPU inside DataLoader workers and does a GPU->CPU->GPU round trip
    mid-forward (reference: manydepth/normals_vec.py:12,21,26).
  * NHWC layout everywhere; convolutions map onto the MXU; elementwise physics
    fuses into surrounding ops under XLA, with Pallas kernels for the hottest
    fused chains.
  * Data parallelism via jax.sharding.Mesh + jit shardings (the reference has
    no distributed support at all; reference: manydepth/trainer.py:79).
"""

__version__ = "0.1.0"
