"""Dataset mixing tests: CombinedDataset epoch batching over heterogeneous
sub-datasets (reference datasets/loader.py combined/triple_training +
train.py --add_bootstrapping_dataset)."""

import numpy as np

from confidence_bootstrapping_tpu.bootstrapping.offline_dataset import BootstrappingDataset
from confidence_bootstrapping_tpu.data.complex_graph import ComplexBatch, pad_complex, pick_bucket
from confidence_bootstrapping_tpu.data.pdbbind import CombinedDataset

from test_bootstrapping import _synthetic_target


class _ListDS:
    """Minimal dataset stub (get/len/lm_dim) over HostComplex items."""

    def __init__(self, complexes, lm=16):
        self.complexes = list(complexes)
        self._lm = lm

    def __len__(self):
        return len(self.complexes)

    def get(self, idx):
        return self.complexes[idx]

    def lm_dim(self):
        return self._lm


def _host(name, seed, n_lig=8, n_rec=20):
    return _synthetic_target(name, seed, n_lig=n_lig, n_rec=n_rec).hc


def _padded(hc, lm=16):
    b = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f))
    return pad_complex(hc, b, lm_dim=lm)


def test_combined_epoch_batches_mixes_and_buckets():
    small = [_host(f"S{i}", i) for i in range(3)]
    big = [_host(f"B{i}", 10 + i, n_lig=20, n_rec=40) for i in range(2)]
    boot_items = [(_padded(_host(f"G{i}", 20 + i)), f"G{i}", 0.5 * i) for i in range(2)]
    boot = BootstrappingDataset(boot_items, temperature=1.0, seed=0)

    ds = CombinedDataset(_ListDS(small + big), boot)
    assert len(ds) == 7
    assert ds.lm_dim() == 16

    rng = np.random.RandomState(0)
    batches = ds.epoch_batches(batch_size=2, rng=rng)
    assert all(isinstance(b, ComplexBatch) for b in batches)
    # every batch internally shape-consistent, small/big buckets never mixed
    sizes = {int(b.lig_f.shape[1]) for b in batches}
    assert len(sizes) >= 2  # two distinct buckets present
    # one epoch serves every index exactly once (up to tail repetition)
    total = sum(int(b.lig_f.shape[0]) for b in batches)
    assert total >= len(ds)


def test_combined_nested_and_empty():
    small = [_host(f"S{i}", i) for i in range(2)]
    inner = CombinedDataset(_ListDS(small))
    outer = CombinedDataset(inner, None)
    assert len(outer) == 2
    rng = np.random.RandomState(1)
    batches = outer.epoch_batches(batch_size=4, rng=rng)
    assert len(batches) == 1 and int(batches[0].lig_f.shape[0]) == 4
