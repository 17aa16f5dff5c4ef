"""Chains output container.

≙ the MCMCChains ``Chains`` surface the reference bundles into
(ext/AdvancedMHMCMCChainsExt.jl): named parameters, an ``lp`` internals
column, ``start``/``thin`` iteration labeling, and summary statistics
(mean/std/ess/rhat/mcse — the reference gets these from MCMCChains
downstream, README.md:57-63).

Layout is ``(n_samples, n_params, n_chains)`` — iterations × parameters ×
chains, the MCMCChains convention (for Ensemble samplers the chains axis is
the walker axis, ≙ the 3-D path at ext/AdvancedMHMCMCChainsExt.jl:80-121).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..diagnostics import ess, integrated_autocorr_time, mcse, rhat


class Chains:
    def __init__(
        self,
        values: jax.Array,  # (n_samples, n_params, n_chains) — params only
        lp: jax.Array,  # (n_samples, n_chains)
        names: Sequence[str],
        start: int = 1,
        thin: int = 1,
    ):
        self.values = values
        self.lp = lp
        self.names = list(names)
        self.internals = ["lp"]
        self.start = start
        self.thin = thin
        if values.ndim != 3:
            raise ValueError("values must be (n_samples, n_params, n_chains)")
        if len(self.names) != values.shape[1]:
            raise ValueError("names length must match n_params")

    # -- shape info --------------------------------------------------------

    @property
    def n_samples(self) -> int:
        return self.values.shape[0]

    @property
    def n_params(self) -> int:
        return self.values.shape[1]

    @property
    def n_chains(self) -> int:
        return self.values.shape[2]

    @property
    def range(self) -> range:
        """≙ MCMCChains ``range(chain)`` — iteration labels."""
        return range(
            self.start, self.start + self.n_samples * self.thin, self.thin
        )

    @property
    def array(self) -> jax.Array:
        """Full (n_samples, n_params+1, n_chains) array incl. the lp column
        (≙ ``Array(chain)`` with internals)."""
        return jnp.concatenate([self.values, self.lp[:, None, :]], axis=1)

    # -- access ------------------------------------------------------------

    def _index(self, name: str) -> int:
        if name == "lp":
            return -1
        return self.names.index(name)

    def __getitem__(self, name: str) -> jax.Array:
        """Draws for one parameter, shape (n_samples, n_chains)."""
        if name == "lp":
            return self.lp
        return self.values[:, self._index(name), :]

    def __repr__(self) -> str:
        return (
            f"Chains({self.n_samples} samples × {self.n_params} params × "
            f"{self.n_chains} chains, start={self.start}, thin={self.thin}, "
            f"params={self.names})"
        )

    # -- statistics --------------------------------------------------------

    def mean(self, name: Optional[str] = None):
        if name is not None:
            return jnp.mean(self[name])
        return jnp.mean(self.values, axis=(0, 2))

    def std(self, name: Optional[str] = None):
        if name is not None:
            return jnp.std(self[name])
        return jnp.std(self.values, axis=(0, 2))

    def cov(self) -> jax.Array:
        """Covariance of the flattened draws, (n_params, n_params)
        (≙ ``cov(Array(chain))`` in the RAM doctest)."""
        flat = self.values.transpose(0, 2, 1).reshape(-1, self.n_params)
        return jnp.cov(flat, rowvar=False)

    def summary(self) -> Dict[str, Dict[str, float]]:
        """Per-parameter mean/std/naive_se/mcse/ess/rhat (≙ MCMCChains
        summarystats, reference README.md:57-63 output columns)."""
        out: Dict[str, Dict[str, float]] = {}
        for i, name in enumerate(self.names):
            x = self.values[:, i, :]
            n_total = x.shape[0] * x.shape[1]
            std = float(jnp.std(x))
            out[name] = {
                "mean": float(jnp.mean(x)),
                "std": std,
                "naive_se": std / n_total**0.5,
                "mcse": float(mcse(x)),
                "ess": float(ess(x)),
                "rhat": float(rhat(x)),
            }
        return out

    def autocorr_time(self, c: float = 5.0) -> Dict[str, float]:
        """Per-parameter integrated autocorrelation time τ (Sokal window;
        ≙ emcee's ``get_autocorr_time`` for ensemble runs — chains/walkers
        average identically). Estimates are trustworthy when the run length
        is ≳ 50·τ."""
        return {
            name: float(integrated_autocorr_time(self.values[:, i, :], c=c))
            for i, name in enumerate(self.names)
        }

    def rhat_nested(self, num_superchains: int) -> Dict[str, float]:
        """Per-parameter nested R̂ (Margossian et al. 2022) — the
        convergence check for many-short-chains runs (valid down to a
        single draw per chain). Chains are grouped contiguously into
        ``num_superchains`` groups; see diagnostics.rhat_nested."""
        from ..diagnostics import rhat_nested as _nrhat

        return {
            name: float(_nrhat(self.values[:, i, :], num_superchains))
            for i, name in enumerate(self.names)
        }

    DEFAULT_QUANTILES = (0.025, 0.25, 0.5, 0.75, 0.975)

    def quantiles(
        self, probs: Sequence[float] = DEFAULT_QUANTILES
    ) -> Dict[str, Dict[float, float]]:
        """Per-parameter posterior quantiles over all draws (≙ the MCMCChains
        'Quantiles' table, reference README.md:66-74: 2.5/25/50/75/97.5%)."""
        qs = jnp.quantile(
            self.values, jnp.asarray(list(probs)), axis=(0, 2)
        )  # (n_probs, n_params)
        return {
            name: {float(p): float(qs[j, i]) for j, p in enumerate(probs)}
            for i, name in enumerate(self.names)
        }

    def describe(self) -> str:
        """Human-readable report: header, summary statistics, and quantiles
        (≙ the printed MCMCChains output block, reference README.md:44-74)."""
        lines = [
            f"Chains with data of type "
            f"{self.n_samples}×{self.n_params + 1}×{self.n_chains} Array",
            f"Iterations        = {self.range.start}:"
            f"{self.range[-1] if self.n_samples else self.range.start}",
            f"Thinning interval = {self.thin}",
            f"Chains            = {self.n_chains}",
            f"Samples per chain = {self.n_samples}",
            f"internals         = {', '.join(self.internals)}",
            f"parameters        = {', '.join(self.names)}",
            "",
            "Summary Statistics",
        ]
        stats = self.summary()
        cols = ["mean", "std", "naive_se", "mcse", "ess", "rhat"]
        width = max(10, *(len(n) + 2 for n in self.names)) if self.names else 10
        lines.append(
            "  " + "parameters".ljust(width)
            + "".join(c.rjust(12) for c in cols)
        )
        for name in self.names:
            row = stats[name]
            lines.append(
                "  " + name.ljust(width)
                + "".join(f"{row[c]:12.4g}" for c in cols)
            )
        lines += ["", "Quantiles"]
        quants = self.quantiles()
        probs = list(self.DEFAULT_QUANTILES)
        lines.append(
            "  " + "parameters".ljust(width)
            + "".join(f"{100 * p:g}%".rjust(12) for p in probs)
        )
        for name in self.names:
            lines.append(
                "  " + name.ljust(width)
                + "".join(f"{q:12.4g}" for q in quants[name].values())
            )
        return "\n".join(lines)

    # -- concatenation (≙ AbstractMCMC.chainscat) --------------------------

    @staticmethod
    def cat(*chains: "Chains") -> "Chains":
        """Concatenate along the chain axis (≙ ``chainscat``)."""
        first = chains[0]
        for c in chains[1:]:
            if c.names != first.names:
                raise ValueError("Cannot chainscat chains with different params")
        return Chains(
            jnp.concatenate([c.values for c in chains], axis=2),
            jnp.concatenate([c.lp for c in chains], axis=1),
            first.names,
            start=first.start,
            thin=first.thin,
        )
