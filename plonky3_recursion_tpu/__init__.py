"""plonky3_recursion_tpu — a TPU-native recursive STARK proving stack.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Plonky3-recursion reference stack (see SURVEY.md): 31-bit prime fields packed
in u32 lanes, batched Poseidon2, NTT/coset-LDE, Merkle MMCS commitments, a
FRI-based batch-STARK prover, a circuit IR + builder that lowers a fixed
recursive verifier into dense witness tables, and layer-chaining recursion.

Layer map (mirrors SURVEY.md §1):
  fields/   — L0 field & extension arithmetic (u32 Montgomery lanes)
  ops/      — L0/L1 kernels: Poseidon2, NTT/LDE, Merkle hashing, FRI folds
  stark/    — L1/L2 protocol engine: challenger, domains, lookups, FRI PCS,
              uni-stark and batch-stark prove/verify
  circuit/  — L3 circuit IR, builder, lowerer/optimizer, runner, NPO plugins
  prover/   — L4 table AIRs (Const/Public/Alu/Poseidon2) + BatchStarkProver
  recursion/— L6 recursive verifier circuits + prove_next_layer API
  parallel/ — multi-chip sharding (mesh, shard_map collectives)
  native/   — C++ scalar reference library for golden vectors
"""

__version__ = "0.1.0"
