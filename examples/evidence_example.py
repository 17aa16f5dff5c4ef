"""Marginal-likelihood (evidence) estimation with power posteriors
(beyond-parity; runtime/evidence.py).

Bayesian model comparison on the conjugate Normal-Normal model: the
stepping-stone estimate (with its Monte-Carlo standard error) must match
the closed-form log marginal likelihood, and the auto-tuned per-rung
proposal scales keep every ladder rung mixing.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import MvNormal, Normal, log_evidence, log_evidence_ais

N_SAMPLES = int(os.environ.get("N_SAMPLES", 3000))
NUM_CHAINS = int(os.environ.get("NUM_CHAINS", 64))


def analytic_log_evidence(y, sigma, tau):
    n = len(y)
    cov = sigma**2 * np.eye(n) + tau**2 * np.ones((n, n))
    _, logdet = np.linalg.slogdet(2.0 * np.pi * cov)
    return float(-0.5 * (logdet + y @ np.linalg.solve(cov, y)))


def main():
    y = np.asarray([0.8, 1.3, 0.2, 1.0, 0.6], np.float32)
    sigma, tau = 1.0, 1.0
    y_j = jnp.asarray(y)

    def loglik(theta):
        return jnp.sum(Normal(theta[0], sigma).log_prob(y_j))

    out = log_evidence(
        loglik, MvNormal(jnp.zeros(1), scale=tau), N_SAMPLES, key=0,
        num_chains=NUM_CHAINS,
    )
    want = analytic_log_evidence(y, sigma, tau)
    print(f"stepping-stone log Z = {out['log_z_ss']:+.4f} ± {out['se_ss']:.4f}")
    print(f"thermo-integration   = {out['log_z_ti']:+.4f}")
    print(f"analytic             = {want:+.4f}")
    print(f"rung acceptance: {np.round(out['acceptance'], 2)}")
    print(f"auto proposal scales: {np.round(out['proposal_scales'], 3)}")
    assert abs(out["log_z_ss"] - want) < max(0.1, 4 * out["se_ss"])
    assert np.all(out["acceptance"] > 0.1)

    # Third estimator: AIS (Neal 2001) — every chain sweeps the ladder,
    # unbiased in Z for any ladder; weight health shown by the Kish ESS.
    ais = log_evidence_ais(
        loglik, MvNormal(jnp.zeros(1), scale=tau), key=1,
        num_chains=max(256, NUM_CHAINS),
    )
    print(f"AIS                  = {ais['log_z_ais']:+.4f} ± {ais['se_ais']:.4f}"
          f"  (weight ESS {ais['ess_weights']:.0f})")
    assert abs(ais["log_z_ais"] - want) < max(0.1, 4 * ais["se_ais"])


if __name__ == "__main__":
    main()
