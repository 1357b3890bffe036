"""Host utility tests: conformers, torsional dataset, ESM prep, preprocess."""

import os

import numpy as np
import jax

from confidence_bootstrapping_tpu.data import conformers, esm_prep, preprocess_pdb, torsional
from confidence_bootstrapping_tpu.data.mol_io import Molecule, ProteinStructure, Residue, write_sdf


def _chain_mol(n=8, seed=0):
    rng = np.random.RandomState(seed)
    pos = np.cumsum(rng.rand(n, 3).astype(np.float32) + 0.5, axis=0)
    bonds = [(i, i + 1, 1) for i in range(n - 1)]
    return Molecule(np.full(n, 6), pos, bonds, np.zeros(n, dtype=int), "chain")


def test_conformer_matching_recovers_torsions():
    mol = _chain_mol()
    scrambled = conformers.generate_conformer(mol, seed=1)
    before = conformers._aligned_rmsd(scrambled, mol.pos)
    matched, after = conformers.optimize_rotatable_bonds(mol, mol.pos, seed_pos=scrambled, maxiter=25)
    assert after < before
    assert after < 0.5


def test_torsional_dataset_and_noise(tmp_path):
    mol = _chain_mol()
    for i in range(3):
        write_sdf(mol, mol.pos + i, str(tmp_path / f"m{i}.sdf"), name=f"m{i}")
    ds = torsional.TorsionalDataset(str(tmp_path))
    assert len(ds) == 3
    rng = np.random.RandomState(0)
    batches = ds.epoch_batches(2, rng)
    assert batches
    from confidence_bootstrapping_tpu.config import TrainConfig
    from confidence_bootstrapping_tpu.ops.schedules import SigmaParams

    noised, targets = torsional.torsional_apply_noise(batches[0], jax.random.PRNGKey(0), SigmaParams(), TrainConfig())
    assert np.isfinite(np.asarray(noised.lig_pos)).all()
    # torsion-only: bond lengths preserved
    b = batches[0]
    for arrs in (b, noised):
        pos = np.asarray(arrs.lig_pos)
        src = np.asarray(arrs.lig_edge_src)
        dst = np.asarray(arrs.lig_edge_dst)
        m = np.asarray(arrs.lig_edge_mask)
        d = np.linalg.norm(np.take_along_axis(pos, src[..., None], 1) - np.take_along_axis(pos, dst[..., None], 1), axis=-1)
        if arrs is b:
            want = d[m]
        else:
            np.testing.assert_allclose(d[m], want, atol=1e-3)
    loss, base = torsional.torsional_loss(np.zeros_like(np.asarray(targets.tor_score)), targets, noised)
    assert np.isfinite(float(loss))


def test_esm_prep_fasta_dedup(tmp_path):
    r1 = Residue("ALA", "A", 1, " ")
    r1.atoms["CA"] = np.zeros(3)
    r2 = Residue("GLY", "B", 1, " ")
    r2.atoms["CA"] = np.ones(3)
    st = ProteinStructure([r1, r2])
    st2 = ProteinStructure([r1])  # shares chain A sequence
    mapping = esm_prep.write_dedup_fasta({"c1": st, "c2": st2}, str(tmp_path / "seqs.fasta"))
    text = open(tmp_path / "seqs.fasta").read()
    assert text.count(">") == 2  # "A" and "G" sequences, deduped
    assert mapping[("c1", "A")] == mapping[("c2", "A")]


def test_preprocess_split_biounit(tmp_path):
    # synthetic PDB with one protein residue and a 4-atom HETATM ligand
    lines = []
    for i, (name, x) in enumerate([("N", 0.0), ("CA", 1.5), ("C", 3.0), ("O", 4.0)]):
        lines.append(f"ATOM  {i+1:5d}  {name:<3s}ALA A   1    {x:8.3f}{0.0:8.3f}{0.0:8.3f}  1.00  0.00           {name[0]:>2s}")
    for i, x in enumerate([10.0, 11.4, 12.8, 14.2]):
        lines.append(f"HETATM{i+5:5d}  C{i+1:<2d} LIG A 101    {x:8.3f}{0.0:8.3f}{0.0:8.3f}  1.00  0.00           C ")
    lines.append("END")
    pdb = tmp_path / "test.pdb"
    pdb.write_text("\n".join(lines) + "\n")
    made = preprocess_pdb.split_biounit(str(pdb), str(tmp_path / "out"))
    assert made == ["test_LIG_A101"]
    d = tmp_path / "out" / "test_LIG_A101"
    assert (d / "test_LIG_A101_ligand.sdf").exists()
    from confidence_bootstrapping_tpu.data.mol_io import parse_sdf

    m = parse_sdf(str(d / "test_LIG_A101_ligand.sdf"))
    assert m.num_atoms == 4 and len(m.bonds) == 3  # chain inferred by distance


def test_blacklist_filters_waters(tmp_path):
    lines = ["HETATM    1  O   HOH A 201      10.000  10.000  10.000  1.00  0.00           O "]
    lines.append("END")
    pdb = tmp_path / "w.pdb"
    pdb.write_text("\n".join(lines) + "\n")
    assert preprocess_pdb.extract_hetero_ligands(str(pdb)) == []


def test_relax_hooks_degrade_without_binaries():
    """obrms/xtb hooks (eval/relax.py) return None when binaries are absent."""
    import numpy as np
    from confidence_bootstrapping_tpu.data.mol_io import Molecule
    from confidence_bootstrapping_tpu.eval import relax

    pos = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    mol = Molecule(np.full(5, 6), pos, [(i, i + 1, 1) for i in range(4)], np.zeros(5, dtype=int))
    assert not relax.have_binary("definitely_not_a_binary_xyz")
    if not relax.have_binary("obrms"):
        assert relax.obrms("/nonexistent.sdf", mol, pos[None]) is None
    if not relax.have_binary("xtb"):
        assert relax.xtb_relax(mol, pos) is None


def test_reference_manifest_translation():
    """models/factory.py config_from_reference_manifest maps both shipped
    reference manifests onto our typed config (back-compat defaulting)."""
    import yaml
    from confidence_bootstrapping_tpu.models.factory import config_from_reference_manifest

    score = yaml.safe_load(open("/root/reference/workdir/pretrained_score/model_parameters.yml"))
    cfg = config_from_reference_manifest(score)
    assert cfg.ns == 32 and cfg.nv == 6 and cfg.sh_lmax == 1
    assert cfg.num_conv_layers == 5 and cfg.num_prot_emb_layers == 3
    assert cfg.embed_also_ligand and cfg.reduce_pseudoscalars and not cfg.all_atoms
    assert cfg.batch_norm and cfg.differentiate_convolutions and cfg.fixed_center_conv
    assert cfg.sigma.tr_sigma_max == 19.0 and cfg.sigma.rot_sigma_min == 0.06
    assert cfg.lm_embedding_dim == 1280  # esm path set in manifest

    conf = yaml.safe_load(open("/root/reference/workdir/pretrained_confidence/model_parameters.yml"))
    ccfg = config_from_reference_manifest(conf)
    assert ccfg.all_atoms and ccfg.confidence_mode

    # ancient manifest with almost nothing -> defaults, no crash
    old = config_from_reference_manifest({"ns": 16, "no_batch_norm": True})
    assert old.ns == 16 and not old.batch_norm and old.nv == 6
