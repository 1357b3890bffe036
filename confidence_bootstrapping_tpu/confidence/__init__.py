"""Confidence (pose-classifier) stack: datasets + training."""
