"""Pallas TPU kernels for the hot ops (fused tensor-product convolution)."""
