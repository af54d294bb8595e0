"""fedcola_tpu: a TPU-native multi-modal federated-learning framework.

A from-scratch JAX / XLA / Pallas rebuild with the capabilities of FedCola
("Towards Multi-modal Transformers in Federated Learning", ECCV 2024,
reference implementation: imguangyu/FedCola).  The reference simulates
federated clients sequentially in Python threads around PyTorch; here the
same federation semantics are re-architected TPU-first:

* the ModalityAgnosticTransformer is a pure function over parameter pytrees
  (stacked transformer layers scanned with ``lax.scan``),
* sampled clients train as *batched* local-update programs (``jax.vmap``
  over a leading client axis, shardable over a ``jax.sharding.Mesh``),
* server aggregation (``shared_param`` x ``share_scope`` x ``colearn_param``
  sharing rules, FedCola aux exchange, modality compensation) is a fused
  on-device weighted reduction with host-precomputed coefficients.

Reference parity notes cite the upstream files as ``file:line``.
"""

__version__ = "0.1.0"

from fedcola_tpu.config import ExperimentConfig  # noqa: F401
