"""Round-3 probe: where does ChEES ESS/s time go, and what does it adapt to?

Run on the real chip from /root/repo:  python benchmarks/probe_chees_r3.py
"""
import time

import jax
import jax.numpy as jnp

from advancedmh_tpu import ChEESHMC
from advancedmh_tpu.diagnostics import ess
from advancedmh_tpu.models.targets import gaussian_mean_scale_model

N_CHAINS = 16384
N, W = 1500, 500

model = gaussian_mean_scale_model()
spl = ChEESHMC(initial_step_size=0.05, initial_trajectory_length=0.25,
               max_leapfrog=16)


@jax.jit
def warm(seed_key):
    _, state = jax.vmap(
        lambda k: spl.init(k, model, jnp.asarray([0.0, 1.0]))
    )(jax.random.split(seed_key, N_CHAINS))

    def wbody(s, j):
        _, s = spl.step_warmup_batched(
            jax.random.fold_in(seed_key, j), s, model, (N_CHAINS,)
        )
        return s, None

    state, _ = jax.lax.scan(wbody, state, jnp.arange(W))
    return state


@jax.jit
def frozen(seed_key, state):
    def body(s, j):
        t, s = spl.step_batched(
            jax.random.fold_in(seed_key, W + j), s, model, (N_CHAINS,)
        )
        return s, t.params[:, 0]

    _, mus = jax.lax.scan(body, state, jnp.arange(N))
    return mus


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


k = jax.random.key(0)
st = warm(k)
fence(st.log_eps_bar)
mus = frozen(k, st)
fence(mus[-1, 0])

for trial in range(3):
    sk = jax.random.key(1 + trial)
    t0 = time.perf_counter()
    st = warm(sk)
    fence(st.log_eps_bar)
    t1 = time.perf_counter()
    mus = frozen(sk, st)
    fence(mus[-1, 0])
    t2 = time.perf_counter()
    eps_b = float(jnp.exp(st.log_eps_bar.reshape(-1)[0]))
    T_b = float(jnp.exp(st.log_traj_bar.reshape(-1)[0]))
    minv = jax.tree_util.tree_map(lambda l: l.reshape(-1, l.shape[-1])[0],
                                  st.inverse_mass)
    e = float(ess(mus))
    print(
        f"trial {trial}: warm {t1-t0:.3f}s  frozen {t2-t1:.3f}s  "
        f"eps_bar={eps_b:.4f} T_bar={T_b:.4f} T/eps={T_b/eps_b:.2f} "
        f"minv={jnp.asarray(minv)} ess_mu={e:.1f} "
        f"ess/draw={e/(N*N_CHAINS):.3f} "
        f"ess_per_s_total={e/(t2-t0):.3e} ess_per_s_frozen={e/(t2-t1):.3e}"
    )
