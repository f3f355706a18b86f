"""frog_tpu — TPU-native hubless groupwise 3D image registration.

A brand-new JAX/XLA/Pallas framework with the capability surface of
valette/FROG: 3D-SURF keypoint extraction, all-pairs descriptor matching,
and a groupwise optimizer (chi-mixture EM inlier weighting, linear
similarity registration, multi-level cubic B-spline deformable registration
with a guaranteed-diffeomorphism constraint), plus common-space resampling
and atlas tools.  Designed TPU-first: batched MXU matmuls for matching,
segment-sum scatter for B-spline gradients, and image/pair sharding over
``jax.sharding.Mesh`` for multi-chip scaling.
"""

__version__ = "0.1.0"
