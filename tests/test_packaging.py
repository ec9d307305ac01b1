"""Packaging smoke test — the analogue of the reference's CMake package
smoke (tests/package_smoke_test.cmake + package_smoke/main.cpp): build the
wheel offline, unpack it into a scratch prefix, and import + solve from
there in a clean subprocess (no repo on sys.path)."""

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def test_wheel_builds_and_imports():
    if shutil.which("pip") is None and subprocess.run(
        [sys.executable, "-m", "pip", "--version"], capture_output=True
    ).returncode != 0:
        pytest.skip("no pip")
    with tempfile.TemporaryDirectory() as tmp:
        build = subprocess.run(
            [sys.executable, "-m", "pip", "wheel", "--no-deps",
             "--no-build-isolation", "-w", tmp, str(REPO)],
            capture_output=True, text=True, timeout=600,
        )
        assert build.returncode == 0, build.stderr[-2000:]
        wheels = list(Path(tmp).glob("cddp_tpu-*.whl"))
        assert len(wheels) == 1, wheels
        prefix = Path(tmp) / "site"
        with zipfile.ZipFile(wheels[0]) as zf:
            zf.extractall(prefix)

        code = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import jax.numpy as jnp\n"
            "import cddp_tpu as ct\n"
            "assert not ct.__file__.startswith(%r), ct.__file__\n"
            "from cddp_tpu.models import Unicycle\n"
            "obj = ct.quadratic_objective(0.1*jnp.eye(3), 0.05*jnp.eye(2),\n"
            "                             100.0*jnp.eye(3), jnp.ones(3), 0.05)\n"
            "prob = ct.problem(Unicycle(), obj, jnp.zeros(3), 10, 0.05)\n"
            "sol = ct.solve(prob, 'CLDDP', ct.CDDPOptions(max_iterations=5))\n"
            "assert float(sol.final_objective) > 0\n"
            "print('wheel-smoke OK', ct.__file__)\n"
        ) % str(REPO / "cddp_tpu")
        env = dict(os.environ)
        env["PYTHONPATH"] = str(prefix)
        env["JAX_PLATFORMS"] = "cpu"
        run = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=600, env=env, cwd=tmp,
        )
        assert run.returncode == 0, (run.stdout, run.stderr[-2000:])
        assert "wheel-smoke OK" in run.stdout


def test_dependency_policy_guard():
    """tools/check_python_dependency_policy.py passes on the in-tree
    pyproject (python-dependency-guard.yaml role) and rejects a dependency
    that is absent from the allowlist."""
    import subprocess
    import sys

    run = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_python_dependency_policy.py")],
        capture_output=True, text=True, timeout=60,
    )
    assert run.returncode == 0, (run.stdout, run.stderr)

    sys.path.insert(0, str(REPO / "tools"))
    try:
        import check_python_dependency_policy as guard

        assert guard.requirement_name("left-pad==9.9") == "left-pad"
        allow_text = (REPO / "security" / "python-direct-deps-allowlist.txt").read_text()
        assert "left-pad" not in allow_text
        assert guard.is_direct_reference("x @ git+https://github.com/a/b")
    finally:
        sys.path.pop(0)
