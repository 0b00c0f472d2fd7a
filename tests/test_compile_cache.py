"""Persistent-compile-cache policy (VERDICT r3 weak #6).

XLA:CPU AOT cache entries embed host ISA/scheduling features that XLA does
not key the cache by; loading an entry written on a different host can kill
the process with SIGILL (no in-process guard can catch it). The package
therefore must NEVER auto-enable the persistent cache on the CPU backend —
a cold compile is strictly safer — while still honouring an explicit
``PT_COMPILE_CACHE=<dir>`` opt-in (fingerprint-partitioned) and staying on
for TPU-class backends (whose entries XLA keys internally).

These run the import in a subprocess: the policy executes at package import
time, and the gotcha from .claude/skills/verify applies — JAX_PLATFORMS=cpu
is ignored in this image, so the child selects CPU via jax.config before
importing the package (exactly what tests/conftest.py does).
"""

import os
import subprocess
import sys

_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
import path_tracer_tpu
print(repr(jax.config.jax_compilation_cache_dir))
"""


def _run(extra_env):
    env = dict(os.environ)
    env.pop("PT_COMPILE_CACHE", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True,
        text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_cache_auto_never_enables_on_cpu():
    assert _run({}) == "None"
    assert _run({"PT_COMPILE_CACHE": "1"}) == "None"


def test_cache_off_knob():
    assert _run({"PT_COMPILE_CACHE": "0"}) == "None"


def test_cache_explicit_dir_forces_on(tmp_path):
    d = str(tmp_path / "cache")
    got = _run({"PT_COMPILE_CACHE": d})
    assert got == repr(d)
    assert os.path.isdir(d)
