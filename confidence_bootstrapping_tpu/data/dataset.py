"""Generic featurized-complex dataset with idempotent caching.

The host-side analogue of the reference's dataset layer (PDBBind/MOAD share
this machinery, ``datasets/pdbbind.py:136-424``): featurize complexes once,
pickle the HostComplex arrays into a cache directory keyed by the
featurization parameters, then serve padded bucket-grouped batches.

Chunked parallel preprocessing (the reference uses a multiprocessing.Pool
writing 1000-complex pickle chunks) degrades gracefully to serial on this
single-core host; the cache layout is chunk-compatible.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import featurize, mol_io
from .complex_graph import HostComplex, batch_complexes, pad_complex, pick_bucket


class ComplexDataset:
    """A list of featurized complexes with bucket-grouped batch serving."""

    def __init__(
        self,
        entries: Sequence[Tuple[str, str, str]],  # (name, protein_path, ligand_path)
        cache_dir: Optional[str] = None,
        lm_embeddings: Optional[Dict[str, np.ndarray]] = None,
        remove_hs: bool = True,
        c_alpha_max_neighbors: int = 24,
        receptor_radius: float = 15.0,
        knn_only_graph: bool = True,
        all_atoms: bool = False,
        atom_radius: float = 5.0,
        atom_max_neighbors: int = 8,
        max_lig_size: Optional[int] = None,
        min_ligand_size: int = 0,
        max_receptor_size: Optional[int] = None,
        num_workers: int = 1,
    ):
        self.params = dict(
            remove_hs=remove_hs,
            c_alpha_max_neighbors=c_alpha_max_neighbors,
            receptor_radius=receptor_radius,
            knn_only_graph=knn_only_graph,
            all_atoms=all_atoms,
            atom_radius=atom_radius,
            atom_max_neighbors=atom_max_neighbors,
        )
        self.cache_dir = cache_dir
        self.lm_embeddings = lm_embeddings or {}
        self.complexes: List[HostComplex] = []
        self.mols: Dict[str, mol_io.Molecule] = {}

        for name, prot, lig in entries:
            try:
                hc, heavy = self._featurize_one(name, prot, lig)
            except Exception as e:
                print(f"skipping {name}: {type(e).__name__}: {e}")
                continue
            n_lig, n_rec = len(hc.lig_f), len(hc.rec_f)
            if n_lig < min_ligand_size or (max_lig_size and n_lig > max_lig_size):
                continue
            if max_receptor_size and n_rec > max_receptor_size:
                continue
            self.complexes.append(hc)
            self.mols[name] = heavy

    def _cache_key(self, name: str, prot: str, lig: str) -> str:
        h = hashlib.sha1(repr((name, prot, lig, sorted(self.params.items()))).encode()).hexdigest()[:16]
        return f"{name}_{h}.pkl"

    def _featurize_one(self, name, prot, lig):
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)
            path = os.path.join(self.cache_dir, self._cache_key(name, prot, lig))
            if os.path.exists(path):
                with open(path, "rb") as f:
                    return pickle.load(f)
        mol = mol_io.read_molecule(lig)
        structure = mol_io.parse_pdb(prot)
        hc = featurize.build_host_complex(name, mol, structure, lm_embeddings=self.lm_embeddings.get(name), **self.params)
        heavy = mol.remove_hs() if self.params["remove_hs"] else mol
        if self.cache_dir:
            with open(path, "wb") as f:
                pickle.dump((hc, heavy), f)
        return hc, heavy

    def __len__(self):
        return len(self.complexes)

    def lm_dim(self):
        dims = {hc.rec_lm.shape[-1] for hc in self.complexes}
        return max(dims) if dims else 0

    def padded_by_bucket(self) -> Dict[tuple, List[dict]]:
        """Pad all complexes, grouped by their bucket (one jit each)."""
        groups: Dict[tuple, List[dict]] = {}
        lm = self.lm_dim()
        for hc in self.complexes:
            b = pick_bucket(
                len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f),
                n_atoms=0 if hc.atom_f is None else len(hc.atom_f),
                all_atoms=self.params["all_atoms"],
            )
            groups.setdefault(tuple(b), []).append(pad_complex(hc, b, lm_dim=lm))
        return groups

    def get(self, idx: int) -> HostComplex:
        return self.complexes[idx]

    def epoch_batches(self, batch_size: int, rng: np.random.RandomState, drop_last: bool = False):
        """Shuffled padded batches, one bucket per batch (compile reuse)."""
        groups = self.padded_by_bucket()
        padded = [p for items in groups.values() for p in items]
        return batches_from_padded(padded, batch_size, rng, drop_last=drop_last)


def padded_signature(p: dict) -> tuple:
    """Hashable shape signature of a padded complex dict: items batch
    together iff every array shape matches (same bucket, same lm dim,
    same optional keys)."""
    return tuple(sorted((k, np.asarray(v).shape) for k, v in p.items()))


def batches_from_padded(padded, batch_size: int, rng: np.random.RandomState, drop_last: bool = False):
    """Group padded complex dicts by shape signature and stack shuffled
    fixed-size batches (short tails repeated to keep static shapes)."""
    groups: Dict[tuple, List[dict]] = {}
    for p in padded:
        groups.setdefault(padded_signature(p), []).append(p)
    batches = []
    for items in groups.values():
        idx = rng.permutation(len(items))
        for s in range(0, len(items), batch_size):
            sel = idx[s : s + batch_size]
            if drop_last and len(sel) < batch_size:
                continue
            chosen = [items[i] for i in sel]
            while len(chosen) < batch_size:
                chosen.append(chosen[len(chosen) % len(sel)])
            batches.append(batch_complexes(chosen))
    rng.shuffle(batches)
    return batches


def discover_dir(data_dir: str, names: Optional[Sequence[str]] = None, protein_suffix="_protein_processed.pdb"):
    """PDBBind/DockGen-style directory layout -> entries list."""
    out = []
    listing = sorted(os.listdir(data_dir)) if names is None else list(names)
    for n in listing:
        d = os.path.join(data_dir, n)
        if not os.path.isdir(d):
            continue
        prot = os.path.join(d, f"{n}{protein_suffix}")
        for ext in (".sdf", ".mol2", ".mol"):
            lig = os.path.join(d, f"{n}_ligand{ext}")
            if os.path.exists(lig):
                break
        else:
            continue
        if os.path.exists(prot):
            out.append((n, prot, lig))
    return out
