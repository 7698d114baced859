"""declip_tpu — TPU-native (JAX/XLA/Pallas/pjit) CLIP/SLIP/FILIP/DeCLIP/DeFILIP
pretraining framework.

A from-scratch rebuild of the capabilities of Sense-GVT/DeCLIP (the SenseTime
"prototype" framework specialized for contrastive language-image pretraining),
designed TPU-first:

- functional flax models, a single pjit-compiled train step over a
  `jax.sharding.Mesh` (data axis), XLA collectives over ICI instead of
  linklink/NCCL allgather (reference: prototype/model/clip.py:25-49),
- bf16 compute with fp32 master params via optax instead of FP16_Optimizer
  master-weight machinery (reference: prototype/optimizer/fp16_optim.py),
- host-side prefetched tokenization/EDA/augmentation pipeline instead of
  CPU-in-forward text work (reference hazards: prototype/model/declip.py:203-212,
  prototype/model/text_encoder/text_transformer.py:185-188),
- the reference's `type:`/`kwargs:` YAML config convention and experiment-dir
  layout preserved so reference configs map over unchanged
  (reference: prototype/solver/*_solver.py).
"""

__version__ = "0.1.0"
