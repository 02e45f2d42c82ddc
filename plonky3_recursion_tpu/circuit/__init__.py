from .builder import CircuitBuilder
from .compile import Circuit
from .runner import CircuitRunner, MissingInput, Traces, WitnessConflict

__all__ = [
    "CircuitBuilder",
    "Circuit",
    "CircuitRunner",
    "Traces",
    "WitnessConflict",
    "MissingInput",
]
