"""Evaluation: symmetry RMSD, benchmark metrics, visualization."""
