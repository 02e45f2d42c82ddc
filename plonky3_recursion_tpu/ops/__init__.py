from . import hashing, ntt, poseidon2

__all__ = ["hashing", "ntt", "poseidon2"]
