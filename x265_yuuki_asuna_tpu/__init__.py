"""x265-Yuuki-Asuna TPU — a TPU-native HEVC encoder framework.

A from-scratch rebuild of the capabilities of msg7086/x265-Yuuki-Asuna
(x265 3.5) designed for TPU hardware: JAX/XLA/Pallas for the DSP compute
path, host C++ for the sequential CABAC/NAL runtime, jax.sharding meshes
for intra-frame (WPP-analog) and inter-frame (frame-thread-analog)
parallelism. See SURVEY.md for the layer map this implements.
"""

__version__ = "0.1.0"
