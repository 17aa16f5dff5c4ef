"""Sample bundling — ≙ the reference's ``bundle_samples`` methods.

Three output formats, mirroring the reference's base + extension adapters:

- :func:`bundle_chains` ≙ ext/AdvancedMHMCMCChainsExt.jl (incl. the 3-D
  walker path for Ensemble at :80-121)
- :func:`bundle_structarray` ≙ ext/AdvancedMHStructArraysExt.jl (columnar
  struct-of-arrays)
- :func:`bundle_namedtuples` ≙ the ``Vector{NamedTuple}`` base case
  (src/AdvancedMH.jl:80-123)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .chains import Chains
from .flatten import flatten_params


def _layout(result):
    """Returns (values (S,P,Ctot), lp (S,Ctot), names) in Chains layout.

    ``is_ensemble`` covers every population sampler (emcee Ensemble, DE-MC):
    their states carry a leading walker/member axis that bundles into the
    reference's 3-D walker array (ext/AdvancedMHMCMCChainsExt.jl:80-121)."""
    params = result.transitions.params
    lp = jnp.asarray(result.transitions.lp)
    C = result.num_chains
    is_ensemble = bool(getattr(result.sampler, "is_population", False))
    return params, lp, C, is_ensemble


def bundle_chains(result, param_names: Optional[Sequence[str]] = None) -> Chains:
    params, lp, C, is_ensemble = _layout(result)
    sched = result.schedule

    if C is None and not is_ensemble:
        values, names = flatten_params(params, 1, param_names)  # (S, P)
        values = values[:, :, None]
        lp = lp[:, None]
    elif C is None and is_ensemble:
        # (S, W, *ev) → (S, P, W): the reference's 3-D walker array
        values, names = flatten_params(params, 2, param_names)  # (S, W, P)
        values = jnp.swapaxes(values, 1, 2)
        # lp already (S, W)
    elif not is_ensemble:
        # (C, S, *ev) → (S, P, C)
        values, names = flatten_params(params, 2, param_names)  # (C, S, P)
        values = jnp.transpose(values, (1, 2, 0))
        lp = jnp.swapaxes(lp, 0, 1)
    else:
        # (C, S, W, *ev) → (S, P, C*W)
        values, names = flatten_params(params, 3, param_names)  # (C, S, W, P)
        c, s, w, p = values.shape
        values = jnp.transpose(values, (1, 3, 0, 2)).reshape(s, p, c * w)
        lp = jnp.transpose(lp, (1, 0, 2)).reshape(s, c * w)

    return Chains(values, lp, names, start=sched.start, thin=sched.thinning)


class StructArray(dict):
    """Columnar struct-of-arrays view (≙ StructArrays.StructArray): a dict of
    per-parameter draw arrays with attribute access, plus ``lp``."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    @staticmethod
    def cat(*arrays: "StructArray") -> "StructArray":
        """≙ ``chainscat(::StructArray...) = vcat`` (ext/AdvancedMHStructArraysExt.jl:27)."""
        out = StructArray()
        for k in arrays[0]:
            out[k] = jnp.concatenate([a[k] for a in arrays], axis=-1)
        return out


def _sanitize(name: str) -> str:
    return name.replace("[", "_").replace("]", "").replace(".", "_")


def bundle_structarray(
    result, param_names: Optional[Sequence[str]] = None
) -> StructArray:
    """Columnar bundle: each parameter → array of draws with all batch axes
    (draws last axis matches the sample axis ordering of the raw result)."""
    params, lp, C, is_ensemble = _layout(result)
    sample_ndim = 1 + (C is not None) + is_ensemble
    values, names = flatten_params(params, sample_ndim, param_names)
    out = StructArray()
    for i, name in enumerate(names):
        out[_sanitize(name)] = values[..., i]
    out["lp"] = lp
    return out


def chainscat(*bundles):
    """≙ ``AbstractMCMC.chainscat``: concatenate chains along the chain axis
    (Chains) or draws (StructArray, ≙ vcat at
    ext/AdvancedMHStructArraysExt.jl:27)."""
    first = bundles[0]
    if isinstance(first, Chains):
        return Chains.cat(*bundles)
    if isinstance(first, StructArray):
        return StructArray.cat(*bundles)
    raise TypeError(f"chainscat: unsupported bundle type {type(first).__name__}")


def bundle_namedtuples(
    result, param_names: Optional[Sequence[str]] = None
) -> List[Dict[str, float]]:
    """Host-side list of per-sample dicts (single chain only; use the
    columnar/Chains bundles for batched runs)."""
    params, lp, C, is_ensemble = _layout(result)
    if C is not None or is_ensemble:
        raise ValueError(
            "bundle_namedtuples is the single-chain scalar format; use "
            "to_chains()/to_structarray() for batched runs."
        )
    values, names = flatten_params(params, 1, param_names)
    names = [_sanitize(n) for n in names]
    # One C-level pass each (ndarray.tolist gives native floats) — per-element
    # float() calls cost seconds at the reference's own 100k-draw scale.
    rows = np.asarray(values, np.float64).tolist()
    lps = np.asarray(lp, np.float64).tolist()
    return [dict(zip(names, row), lp=l) for row, l in zip(rows, lps)]
