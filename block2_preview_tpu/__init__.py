"""block2_preview_tpu — a TPU-native ab initio DMRG framework (JAX/XLA/Pallas).

Rebuilds the capabilities of block2 (lcyyork/block2-preview) with a TPU-first
architecture: quantum-number-blocked tensors are compiled into static
contraction plans whose GEMMs execute as bucketed, batched matmuls on the MXU;
multi-chip scaling shards complementary-operator work over a
``jax.sharding.Mesh`` with ``psum`` of sigma-vector partial sums (the analog of
block2's distributed-operator MPI parallelism, reference
src/core/parallel_rule.hpp + src/core/parallel_tensor_functions.hpp).

Layer map (mirrors SURVEY.md section 1):
  core/      L0-L3: symmetry groups, StateInfo, block-sparse tensors, FCIDUMP
  ops/       L0: local site operators, contraction-plan compiler + executors,
             iterative solvers (Davidson, ...)
  dmrg/      L4-L6: MPO builders, MPS, moving environments, sweep drivers
  models/    L3: Hamiltonian front-ends (quantum chemistry, Hubbard, Heisenberg)
  parallel/  L7: device-mesh sharding rules and collective plans
  driver/    L10: DMRGDriver user-facing API
"""

__version__ = "0.1.0"
