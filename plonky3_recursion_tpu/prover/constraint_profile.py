"""ConstraintProfile: per-layer AIR-variant selector.

TPU-native equivalent of the reference's `ConstraintProfile`
(`circuit-prover/src/constraint_profile.rs:11`; SURVEY.md §2.2): a
prover/verifier-shared switch selecting the AIR variant a layer is built
with — it must match across circuit build, prove, and recursive verify,
so it lives in `TablePacking`-adjacent config rather than ad-hoc flags.

STANDARD keeps the default chip set; RECURSION_OPTIMIZED is reserved for
variants tuned for verifier-circuit cost (e.g. fewer, wider lookups) as
those land.
"""

from __future__ import annotations

import enum


class ConstraintProfile(enum.Enum):
    STANDARD = "standard"
    RECURSION_OPTIMIZED = "recursion_optimized"
