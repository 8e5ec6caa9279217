"""API hygiene — the analogue of the reference's QA group
(test/qa/qa.jl: Aqua + ExplicitImports public-API checks)."""

import importlib
import inspect

import exponentialutilities_jl_tpu as eu


def test_all_exports_exist():
    for name in eu.__all__:
        assert hasattr(eu, name), f"__all__ lists missing symbol {name}"


def test_submodule_alls_resolve():
    for mod in ["ops.expm", "ops.phi_dense", "ops.krylov", "ops.sparse",
                "ops.host_reduced", "models.expv", "models.phiv",
                "models.timestepping", "models.kiops", "models.expv_taylor",
                "utils.linop", "utils.testmatrices", "parallel.ops",
                "parallel.krylov", "parallel.gspmd"]:
        m = importlib.import_module(f"exponentialutilities_jl_tpu.{mod}")
        for name in getattr(m, "__all__", []):
            assert hasattr(m, name), f"{mod}.__all__ lists missing {name}"


def test_public_functions_documented():
    undocumented = [n for n in eu.__all__
                    if callable(getattr(eu, n))
                    and not inspect.getdoc(getattr(eu, n))]
    assert not undocumented, f"undocumented public symbols: {undocumented}"


def test_version():
    assert eu.__version__


def test_profiling_hooks_smoke(tmp_path):
    # SURVEY §5: optional jax.profiler hooks — must work (or no-op
    # gracefully) on any backend
    import numpy as np
    import jax.numpy as jnp
    import exponentialutilities_jl_tpu as eu
    from exponentialutilities_jl_tpu.utils.profiling import annotate, trace

    A = np.diag(-2.0 * np.ones(32)) + np.diag(np.ones(31), 1) \
        + np.diag(np.ones(31), -1)
    b = np.ones(32)
    with trace(str(tmp_path / "trace")):
        with annotate("expv-smoke"):
            w = eu.expv(0.1, A, jnp.asarray(b), m=10)
    assert np.all(np.isfinite(np.asarray(w)))
