"""Training: losses, noise transform, loops, EMA, checkpoints."""
