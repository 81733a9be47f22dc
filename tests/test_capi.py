"""C API build + run test: compiles libt4a_capi.so and the C driver and
executes it in a standalone process (embedded Python), ref capi crate."""

import pathlib
import shutil
import subprocess
import sys

import pytest

CAPI = pathlib.Path(__file__).resolve().parent.parent / "tensor4all_tpu" / "capi"


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_capi_end_to_end(tmp_path):
    build = subprocess.run(
        ["make", "-C", str(CAPI)], capture_output=True, text=True,
        timeout=180,
    )
    assert build.returncode == 0, build.stderr
    cc = shutil.which("gcc") or shutil.which("g++")
    exe = tmp_path / "test_capi"
    link = subprocess.run(
        [cc, "-O2", "-o", str(exe), str(CAPI / "test_capi.c"),
         f"-L{CAPI}", "-lt4a_capi", "-lm", f"-Wl,-rpath,{CAPI}"],
        capture_output=True, text=True, timeout=120,
    )
    assert link.returncode == 0, link.stderr
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = str(CAPI.parent.parent)
    env["JAX_PLATFORMS"] = "cpu"
    run = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=300, env=env)
    assert run.returncode == 0, (run.stdout, run.stderr)
    assert "capi OK" in run.stdout
