from .core import (
    Proposal,
    StaticProposal,
    RandomWalkProposal,
    SymmetricStaticProposal,
    SymmetricRandomWalkProposal,
    propose,
    as_static_proposal_tree,
    propose_initial,
    q,
    logratio_proposal_density,
    is_proposal,
)

__all__ = [
    "Proposal",
    "StaticProposal",
    "RandomWalkProposal",
    "SymmetricStaticProposal",
    "SymmetricRandomWalkProposal",
    "propose",
    "as_static_proposal_tree",
    "propose_initial",
    "q",
    "logratio_proposal_density",
    "is_proposal",
]
