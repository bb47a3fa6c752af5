"""StreamingFlow-TPU: a TPU-native (JAX/XLA/Pallas) streaming BEV
occupancy-forecasting framework with the capabilities of
synsin0/StreamingFlow (CVPR 2024).

Asynchronous multi-modal sensor streams (multi-camera images + LiDAR sweeps,
each with their own timestamps) are fused into a shared bird's-eye-view latent
that a GRU-ODE integrates continuously in time, decoding future
instance/segmentation predictions at arbitrary timestamps.
"""

__version__ = '0.1.0'

from .config import Config, get_cfg, load_cfg  # noqa: F401
