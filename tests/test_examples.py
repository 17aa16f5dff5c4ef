"""Executable-example tests (≙ the reference's Documenter doctests): every
script in examples/ runs end-to-end at reduced size and its assertions hold."""
import importlib.util
import os


EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def _run(name, env):
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        spec = importlib.util.spec_from_file_location(
            f"example_{name}", os.path.join(EXAMPLES, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_readme_example():
    _run("readme_example", {"N_SAMPLES": "3000", "NUM_CHAINS": "16"})


def test_ram_example():
    _run("ram_example", {"N_SAMPLES": "3000"})


def test_emcee_example():
    _run("emcee_example", {"N_WALKERS": "512", "N_SAMPLES": "600"})


def test_mala_example():
    _run("mala_example", {"N_SAMPLES": "5000"})


def test_logreg_example():
    _run(
        "logreg_example",
        {"DIM": "8", "N_OBS": "128", "N_SAMPLES": "1500", "NUM_CHAINS": "32"},
    )


def test_tempering_example():
    _run("tempering_example", {"N_SAMPLES": "4000", "NUM_CHAINS": "16"})

def test_ess_gp_example():
    _run("ess_gp", {"N_SAMPLES": "600", "NUM_CHAINS": "32", "N_POINTS": "32"})


def test_evidence_example():
    _run("evidence_example", {"N_SAMPLES": "2000", "NUM_CHAINS": "48"})


def test_pooled_adapt_example():
    _run(
        "pooled_adapt_example",
        {"N_SAMPLES": "10", "NUM_CHAINS": "96", "NUM_WARMUP": "200"},
    )


def test_hmc_example():
    _run("hmc_example", {"N_SAMPLES": "1500"})


def test_chees_example():
    _run("chees_example", {"N_SAMPLES": "300"})


def test_geometry_example():
    _run("geometry_example", {"N_SAMPLES": "600"})


def test_particles_example():
    _run("particles_example", {"N_SAMPLES": "800", "NUM_CHAINS": "128"})
