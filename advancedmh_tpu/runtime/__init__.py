from .schedule import Schedule
from .sample import (
    sample,
    build_chain_fn,
    SamplingResult,
    MCMCSerial,
    MCMCThreads,
    MCMCDistributed,
)

__all__ = [
    "Schedule",
    "sample",
    "build_chain_fn",
    "SamplingResult",
    "MCMCSerial",
    "MCMCThreads",
    "MCMCDistributed",
]
