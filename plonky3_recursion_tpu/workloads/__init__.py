from .keccak import KeccakAir, keccak_f_trace, keccak_preprocessed

__all__ = ["KeccakAir", "keccak_f_trace", "keccak_preprocessed"]
