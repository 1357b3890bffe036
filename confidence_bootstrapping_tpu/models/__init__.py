"""Equivariant score / confidence models (flax)."""
