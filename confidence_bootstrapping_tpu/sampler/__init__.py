"""Reverse-diffusion pose sampler (single jitted lax.scan)."""
