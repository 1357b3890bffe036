"""TPU-native Confidence Bootstrapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
LDeng0205/confidence-bootstrapping (DiffDock-L + Confidence Bootstrapping,
arXiv:2402.18396): a score-based generative docking engine on the product
manifold T(3) x SO(3) x T^m, an SE(3)-equivariant tensor-product GNN score
model, a pose confidence model, and the rollout -> filter -> buffer -> finetune
self-training loop.

Design principles (TPU-first):
  * all device code is jit/vmap/shard_map-compatible: fixed shapes, masked
    padded graphs compiled once per size bucket;
  * neighbor search is fixed-capacity padded neighbor lists (no torch_cluster);
  * message aggregation is masked segment/axis reductions (no torch_scatter);
  * diffusion lookup tables (IGSO(3), torus) are device-resident arrays with
    jittable gathers;
  * the 20-step reverse diffusion runs as a single lax.scan;
  * scaling is data-parallel over poses/complexes via jax.sharding.Mesh.
"""

__version__ = "0.1.0"
