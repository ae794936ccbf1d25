"""WOFT-TPU: a TPU-native (JAX/XLA/Pallas) planar-object tracking framework.

Re-implements the capabilities of WOFT ("Planar Object Tracking via Weighted
Optical Flow", Serych & Matas, WACV 2023) as an idiomatic JAX framework:

- ``woft_tpu.models``   — RAFT / WeightedRAFT flow networks (functional pytrees,
  NHWC, ``lax.scan`` GRU iterations, XLA einsum correlation + Pallas lookup).
- ``woft_tpu.geometry`` — batched, differentiable weighted least-squares
  homography solvers (QR / IRLS / SVD) and projective helpers.
- ``woft_tpu.tracker``  — the WOFT tracker state machine as a pure function
  over an explicit state pytree (jit/vmap/scan-able), plus a host shell with
  the reference's ``init``/``track`` API.
- ``woft_tpu.flow``     — the ``compute_flow`` wrapper protocol (padding
  policies, flow->TC conversion, flow caching).
- ``woft_tpu.parallel`` — mesh / sharding helpers for multi-chip scale-out.
- ``woft_tpu.training`` — synthetic-homography training of the weight head
  end-to-end through the differentiable WLS solve.

Reference layout evidence is cited in docstrings as ``ref:<path>:<lines>``
relative to the upstream WOFT repository.
"""

__version__ = "0.1.0"
