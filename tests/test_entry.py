"""Driver-contract regression tests for `__graft_entry__`.

Round-1 postmortem: `dryrun_multichip` crashed under the driver because the
axon site hook pins the platform to the single-chip TPU and JAX cannot
switch platforms after backend init (MULTICHIP_r01.json rc=1).  The entry
must therefore self-provision the virtual CPU mesh pre-init — these tests
lock that in, including a subprocess run under the exact hostile env.
"""
import os
import subprocess
import sys

import pytest

import __graft_entry__ as entry_mod


class TestForcedHostDeviceFlags:
    def test_empty(self):
        out = entry_mod._forced_host_device_flags("", 8)
        assert out == "--xla_force_host_platform_device_count=8"

    def test_existing_smaller_is_raised(self):
        out = entry_mod._forced_host_device_flags(
            "--xla_force_host_platform_device_count=2", 8)
        assert out == "--xla_force_host_platform_device_count=8"

    def test_existing_larger_is_kept(self):
        flags = "--xla_force_host_platform_device_count=16"
        assert entry_mod._forced_host_device_flags(flags, 8) == flags

    def test_other_flags_preserved(self):
        out = entry_mod._forced_host_device_flags(
            "--xla_cpu_enable_fast_math=false", 4)
        assert "--xla_cpu_enable_fast_math=false" in out
        assert "--xla_force_host_platform_device_count=4" in out


class TestEnsureNDevices:
    def test_passes_when_initialized_with_enough(self):
        # conftest already initialized the 8-device CPU platform.
        entry_mod._ensure_n_devices(8)

    def test_raises_when_initialized_with_too_few(self):
        with pytest.raises(RuntimeError, match="cannot switch platforms"):
            entry_mod._ensure_n_devices(9)


@pytest.mark.slow
def test_dryrun_multichip_survives_axon_pin():
    """The driver scenario: fresh interpreter, site hook env, no CPU forcing.

    This is exactly what failed in round 1 — the subprocess inherits the
    machine default env (JAX_PLATFORMS=axon from the site hook) and must
    still complete an 8-device dry run by self-provisioning the CPU mesh.
    """
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "[dryrun_multichip] ok on 8 devices" in proc.stdout
