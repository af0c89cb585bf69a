"""Importing the package must never initialize an accelerator backend.

A module-level jnp op (device constant) initializes the default platform
at import time — on this environment that means dialing the TPU tunnel,
and a downed tunnel turns `import mitsuba2_tpu` into an indefinite hang
(observed 2026-08-17: core/math.py's ONE_MINUS_EPSILON was a jnp.nextafter
call). Library rule: module-level constants are numpy; device arrays are
created inside functions."""
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_package_import_initializes_no_backend():
    mods = sorted(
        str(p.relative_to(REPO)).removesuffix(".py").replace("/", ".")
        for p in (REPO / "mitsuba2_tpu").rglob("*.py")
        if p.name != "__main__.py")
    prog = (
        "import importlib, jax\n"
        f"mods = {mods!r}\n"
        "for m in mods:\n"
        "    importlib.import_module(m)\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, (\n"
        "    'import initialized backend(s): ' + str(list(xla_bridge._backends)))\n"
        "print('no backend initialized')\n")
    out = subprocess.run([sys.executable, "-c", prog], cwd=str(REPO),
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "no backend initialized" in out.stdout
