from .airs import AluAir, ConstAir, PublicAir
from .batch_prover import (
    BatchStarkProof,
    BatchStarkProver,
    CircuitProverData,
    circuit_prover_data,
)

__all__ = [
    "AluAir",
    "ConstAir",
    "PublicAir",
    "BatchStarkProof",
    "BatchStarkProver",
    "CircuitProverData",
    "circuit_prover_data",
]
