"""serendipity_tpu — a TPU-native (JAX / XLA / Pallas / pjit) embedding-and-retrieval
framework with the capabilities of the `factors-of-serendipity-recommendation` reference
pipeline (LightGCN/MF/NGCF/GCN/GCMC embedding training, ProNE spectral init, stratified
candidate generation, eight factor-based recommendation strategies with weighted fusion
and DPP re-ranking, and serendipity evaluation).

Design principles (TPU-first, not a port):
  * everything hot runs under one `jax.jit` — static shapes, `lax` control flow;
  * sparse adjacency propagation is gather + segment-sum (XLA) with a Pallas fused
    kernel for the hot path; dense scoring rides the MXU in bf16;
  * scale-out is a `jax.sharding.Mesh` with row-sharded embedding tables and XLA
    collectives (`psum`, `all_gather`) — there is no NCCL/MPI to mirror;
  * the host-side runtime (text/graph IO, k-core filtering, CSR building, host
    negative-sampler cross-check) is native C++ behind ctypes.
"""

__version__ = "0.1.0"

from serendipity_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
    EvalConfig,
    MeshConfig,
    RecConfig,
    ExperimentConfig,
)
