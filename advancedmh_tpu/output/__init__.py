from .chains import Chains
from .bundle import (
    StructArray,
    bundle_chains,
    bundle_structarray,
    bundle_namedtuples,
    chainscat,
)

__all__ = [
    "Chains",
    "StructArray",
    "bundle_chains",
    "bundle_structarray",
    "bundle_namedtuples",
    "chainscat",
]
