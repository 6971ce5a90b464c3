"""ddp_tpu: a TPU-native (JAX/XLA/Pallas) framework for diffusion-based dense
visual prediction, with the capabilities of JiYuanFeng/DDP."""

__version__ = "0.1.0"
