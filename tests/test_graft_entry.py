"""Driver-contract tests for __graft_entry__.dryrun_multichip.

Round-1 failure mode: the driver invokes dryrun_multichip in a process whose jax sees
one real chip, and the dryrun died with "need 8 devices, have 1". It must now self-host
an n-device virtual CPU mesh — by env mutation before jax initializes, or by
re-executing itself in a subprocess when jax is already latched to a small platform."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # full tier; fast tier = -m 'not slow'

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_inline_on_virtual_mesh():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)  # conftest provides 8 virtual CPU devices → runs inline


@pytest.mark.parametrize("latched", [False, True])
def test_dryrun_self_hosts_when_devices_missing(latched):
    """Fresh process with 1 device: env-mutation path (latched=False) and the
    subprocess-fallback path after jax has already initialized (latched=True)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"  # 1 CPU device unless the dryrun self-hosts
    pre = ("import jax; assert len(jax.devices()) == 1; " if latched else "")
    code = (f"import sys; sys.path.insert(0, {ROOT!r}); " + pre +
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(4)")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=ROOT,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stderr tail:\n{r.stderr[-3000:]}"
