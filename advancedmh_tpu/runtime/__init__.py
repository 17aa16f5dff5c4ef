from .schedule import Schedule
from .sample import (
    sample,
    build_chain_fn,
    SamplingResult,
    MCMCSerial,
    MCMCThreads,
    MCMCDistributed,
)
from .checkpoint import save_state, load_state
from .chunked import ChunkInfo, sample_chunked
from .evidence import log_evidence, log_evidence_ais, power_ladder
from .smc import smc_sample
from .svgd import svgd_sample

__all__ = [
    "Schedule",
    "sample",
    "log_evidence",
    "log_evidence_ais",
    "smc_sample",
    "svgd_sample",
    "power_ladder",
    "build_chain_fn",
    "SamplingResult",
    "MCMCSerial",
    "MCMCThreads",
    "MCMCDistributed",
    "save_state",
    "load_state",
    "sample_chunked",
    "ChunkInfo",
]
