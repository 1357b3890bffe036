"""Optional gnina rescoring hook (reference ``utils/gnina_utils.py``).

Shells out to a user-provided ``gnina`` binary to rescore / locally refine
sampled poses and parses the CNNscore back from the output SDF. Purely
optional evaluation machinery; degrades to a clear error when the binary is
absent (this image ships none).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import List, Optional

import numpy as np

from ..data import mol_io


def have_gnina(binary: str = "gnina") -> bool:
    return shutil.which(binary) is not None


def parse_cnn_scores_from_sdf(path: str) -> List[float]:
    """CNNscore property values of each molecule record in an SDF."""
    scores, grab = [], False
    for line in open(path):
        if grab:
            try:
                scores.append(float(line.strip()))
            except ValueError:
                pass
            grab = False
        if line.startswith("> <CNNscore>") or line.startswith(">  <CNNscore>"):
            grab = True
    return scores


def gnina_rescore(
    mol: mol_io.Molecule,
    poses: np.ndarray,
    protein_path: str,
    binary: str = "gnina",
    minimize: bool = False,
    timeout_s: float = 600.0,
) -> Optional[np.ndarray]:
    """Rescore poses with gnina; returns CNNscores [n] or None w/o binary."""
    if not have_gnina(binary):
        return None
    with tempfile.TemporaryDirectory() as tmp:
        in_sdf = os.path.join(tmp, "poses.sdf")
        out_sdf = os.path.join(tmp, "scored.sdf")
        with open(in_sdf, "w") as f:
            pass
        # write multi-record SDF
        text = []
        for i, p in enumerate(poses):
            single = os.path.join(tmp, f"p{i}.sdf")
            mol_io.write_sdf(mol, p, single, name=f"pose{i}")
            text.append(open(single).read())
        with open(in_sdf, "w") as f:
            f.write("".join(text))
        cmd = [binary, "--receptor", protein_path, "--ligand", in_sdf, "--out", out_sdf,
               "--score_only" if not minimize else "--local_only"]
        subprocess.run(cmd, check=True, timeout=timeout_s, capture_output=True)
        scores = parse_cnn_scores_from_sdf(out_sdf)
    return np.asarray(scores) if scores else None
