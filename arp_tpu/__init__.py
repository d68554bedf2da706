"""ARP-TPU: a TPU-native framework for adaptive multimodal-reward policy learning.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of csmile-1006/ARP
(ARP-DT, NeurIPS 2023): CLIP-based multimodal reward labeling, return-conditioned
transformer policies (ARPDT / BC / GCBC), CLIP fine-tuning with VIP +
inverse-dynamics losses, Procgen data pipelines, and rollout evaluation —
all built TPU-first:

  * compute path: jit + shard_map over a `jax.sharding.Mesh` (dp/fsdp/tp axes),
    Pallas kernels for fused attention and image preprocessing;
  * frozen-encoder inference is batched and bfloat16 on the MXU;
  * reward labeling streams HDF5 frames through a double-buffered host->HBM
    pipeline (reference: arp_dt/label_reward.py does per-image PIL on CPU);
  * checkpointing via Orbax (reference: cloudpickle of replicated state).
"""

__version__ = "0.1.0"
