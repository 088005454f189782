"""Training runtime: losses, GAN step, state, checkpointing, metrics."""
