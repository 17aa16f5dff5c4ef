from .base import (
    Sampler,
    Transition,
    GradientTransition,
    accept_reject,
    select_tree,
    getparams,
    setparams,
)
from .mh import MetropolisHastings, StaticMH, RWMH
from .mala import MALA
from .ram import RobustAdaptiveMetropolis, RobustAdaptiveMetropolisState
from .dr import DelayedRejection
from .dram import DRAM
from .pcn import PreconditionedCrankNicolson
from .emcee import Ensemble, StretchProposal, WalkProposal
from .tempering import ReplicaExchange, ReplicaExchangeState, swap_rates, tune_betas
from .am import AdaptiveMetropolis, AdaptiveMetropolisState
from .barker import Barker
from .hmc import HamiltonianMC
from .hmc_adapt import AdaptiveHMC, AdaptiveHMCState
from .chees import ChEESHMC, ChEESHMCState
from .meads import MEADS, MEADSState
from .ess import EllipticalSlice
from .mtm import MultipleTryMetropolis
from .slice import SliceSampler
from .demc import DifferentialEvolution
from .adapt import (StepSizeAdaptation, StepSizeAdaptationState,
                    optimal_rwmh_accept)

__all__ = [
    "Sampler",
    "Transition",
    "GradientTransition",
    "accept_reject",
    "select_tree",
    "getparams",
    "setparams",
    "MetropolisHastings",
    "StaticMH",
    "RWMH",
    "MALA",
    "RobustAdaptiveMetropolis",
    "RobustAdaptiveMetropolisState",
    "Ensemble",
    "DRAM",
    "PreconditionedCrankNicolson",
    "DelayedRejection",
    "StretchProposal",
    "WalkProposal",
    "ReplicaExchange",
    "ReplicaExchangeState",
    "swap_rates",
    "tune_betas",
    "AdaptiveMetropolis",
    "AdaptiveMetropolisState",
    "Barker",
    "HamiltonianMC",
    "AdaptiveHMC",
    "AdaptiveHMCState",
    "ChEESHMC",
    "ChEESHMCState",
    "MEADS",
    "MEADSState",
    "EllipticalSlice",
    "MultipleTryMetropolis",
    "SliceSampler",
    "DifferentialEvolution",
    "StepSizeAdaptation",
    "StepSizeAdaptationState",
    "optimal_rwmh_accept",
]
