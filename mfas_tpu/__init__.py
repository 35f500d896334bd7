"""mfas_tpu — a TPU-native multimodal fusion architecture search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MFAS
(Pérez-Rúa et al., CVPR 2019; reference implementation jperezrua/mfas):
searchable multimodal fusion networks over frozen pretrained backbones,
sequential model-based architecture search with an LSTM accuracy surrogate,
and full training of found architectures — redesigned TPU-first:

* compute path: jit/pjit over static shapes, `lax.scan` RNNs, XLA convs;
* parallelism: batch sharding over a `jax.sharding.Mesh` (replacing the
  reference's `torch.nn.DataParallel`) plus a *population* axis that trains
  whole sets of candidate fusion architectures in a single vmapped step
  over cached frozen-backbone features;
* checkpoint compatibility: reads/writes PyTorch zip-pickle state_dicts
  without a torch dependency.
"""

__version__ = "0.1.0"
