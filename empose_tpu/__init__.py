"""EM-POSE TPU: a TPU-native (JAX/XLA/Pallas) framework for full-body pose
estimation from sparse electromagnetic sensors, with the capabilities of the
EM-POSE reference (ICCV 2021)."""

__version__ = "0.1.0"
