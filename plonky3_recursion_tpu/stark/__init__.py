from .batch import (
    BatchProof,
    CommonData,
    InstanceShape,
    StarkInstance,
    commit_preprocessed,
    prove_batch,
    verify_batch,
)
from .challenger import DuplexChallenger
from .fri_pcs import FriParams, FriProof, TwoAdicFriPcs, fri_phase_schedule
from .lookups import Interaction, Lookup, check_lookups_balance
from .merkle import MerkleMmcs
from .symbolic import Air, AirBuilder
from .uni import StarkConfig, baby_bear_config, koala_bear_config, prove, verify

__all__ = [
    "Air",
    "AirBuilder",
    "BatchProof",
    "CommonData",
    "DuplexChallenger",
    "FriParams",
    "FriProof",
    "InstanceShape",
    "Interaction",
    "Lookup",
    "MerkleMmcs",
    "StarkConfig",
    "StarkInstance",
    "TwoAdicFriPcs",
    "baby_bear_config",
    "check_lookups_balance",
    "commit_preprocessed",
    "fri_phase_schedule",
    "koala_bear_config",
    "prove",
    "prove_batch",
    "verify",
    "verify_batch",
]
