"""Checkpoint/resume: bit-exact continuation of interrupted runs."""
import jax
import jax.numpy as jnp
import numpy as np

from advancedmh_tpu import (
    MvNormal,
    Normal,
    RWMH,
    RobustAdaptiveMetropolis,
    StaticMH,
    sample,
)
from advancedmh_tpu.runtime import load_state, save_state
from tests.test_mh import MODEL


class TestResume:
    def test_split_run_equals_full_run(self):
        spl = RWMH(MvNormal(jnp.zeros(2), scale=0.1))
        kw = dict(key=0, num_chains=4, initial_params=jnp.asarray([0.0, 1.0]))

        full = sample(MODEL, spl, 100, **kw)

        part1 = sample(MODEL, spl, 50, **kw)
        part2 = sample(
            MODEL, spl, 50, key=0, num_chains=4,
            initial_state=part1.final_state,
            iteration_offset=part1.schedule.total_steps,
            discard_initial=1,  # first kept sample = one step after resume
        )
        lp_full = np.asarray(full.transitions.lp)
        lp_split = np.concatenate(
            [np.asarray(part1.transitions.lp), np.asarray(part2.transitions.lp)],
            axis=1,
        )
        np.testing.assert_array_equal(lp_full, lp_split)

    def test_resume_through_npz_roundtrip(self, tmp_path):
        spl = RobustAdaptiveMetropolis()
        p = str(tmp_path / "state.npz")
        r1 = sample(MODEL, spl, 20, key=1, num_chains=2,
                    initial_params=jnp.asarray([0.0, 1.0]))
        save_state(p, r1.final_state)
        loaded = load_state(p, r1.final_state)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            r1.final_state, loaded,
        )
        r2a = sample(MODEL, spl, 10, key=1, num_chains=2,
                     initial_state=r1.final_state,
                     iteration_offset=r1.schedule.total_steps, discard_initial=1)
        r2b = sample(MODEL, spl, 10, key=1, num_chains=2,
                     initial_state=loaded,
                     iteration_offset=r1.schedule.total_steps, discard_initial=1)
        np.testing.assert_array_equal(
            np.asarray(r2a.transitions.lp), np.asarray(r2b.transitions.lp)
        )

    def test_single_chain_resume(self):
        spl = StaticMH([Normal(0.0, 1.0), Normal(0.0, 1.0)])
        full = sample(MODEL, spl, 60, key=3)
        p1 = sample(MODEL, spl, 30, key=3)
        p2 = sample(MODEL, spl, 30, key=3, initial_state=p1.final_state,
                    iteration_offset=p1.schedule.total_steps, discard_initial=1)
        np.testing.assert_array_equal(
            np.asarray(full.transitions.lp),
            np.concatenate(
                [np.asarray(p1.transitions.lp), np.asarray(p2.transitions.lp)]
            ),
        )
