"""Training: VAE and init-network trainers (jitted steps, DP-shardable)."""
from sdfest_tpu.training.vae_trainer import VAETrainer  # noqa: F401
from sdfest_tpu.training.init_trainer import InitTrainer  # noqa: F401
