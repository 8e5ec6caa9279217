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
