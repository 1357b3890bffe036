"""Manifold math, geometry, and graph primitives (all jittable)."""
