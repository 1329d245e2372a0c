"""Driver entry-point contract: dryrun_multichip's backend-probe policy.

The parent process of ``dryrun_multichip`` must never initialize the axon
TPU backend when the tunnel env is present and JAX_PLATFORMS is not cpu —
a wedged tunnel turns ``jax.devices()`` into a ~25 min attach hang ending
in UNAVAILABLE (observed 2026-08-18), failing the driver's multichip check
even though the virtual CPU mesh needs no TPU. The full dryrun itself is
exercised by the driver (MULTICHIP_r*.json) and by running
``__graft_entry__.dryrun_multichip(8)`` directly; these tests pin only the
dispatch decision, with the subprocess/backend stubbed out.
"""

import jax

import __graft_entry__ as ge


def _stub_run(calls):
    def fake_run(cmd, **kw):
        calls["cmd"] = cmd
        calls["env"] = kw["env"]

        class R:
            returncode = 0
            stdout = "stub child ok\n"
            stderr = ""

        return R()

    return fake_run


def test_parent_skips_tunnel_probe_when_axon_selected(monkeypatch, capsys):
    """Tunnel env + JAX_PLATFORMS=axon → straight to the CPU subprocess."""
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv(ge._CHILD_MARK, raising=False)

    def boom():  # any backend probe is the bug this test pins
        raise AssertionError("parent touched jax.devices() with a tunnel up")

    monkeypatch.setattr(jax, "devices", boom)
    calls = {}
    monkeypatch.setattr(ge.subprocess, "run", _stub_run(calls))

    ge.dryrun_multichip(8)

    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert calls["env"][ge._CHILD_MARK] == "1"
    assert (
        "--xla_force_host_platform_device_count=8" in calls["env"]["XLA_FLAGS"]
    )
    assert "stub child ok" in capsys.readouterr().out


def test_parent_probes_and_reexecs_on_cpu_platform(monkeypatch):
    """JAX_PLATFORMS=cpu: probe is safe; too few devices → subprocess."""
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv(ge._CHILD_MARK, raising=False)

    monkeypatch.setattr(jax, "devices", lambda: [object()])  # 1 < 8
    calls = {}
    monkeypatch.setattr(ge.subprocess, "run", _stub_run(calls))

    ge.dryrun_multichip(8)

    assert calls["env"]["JAX_PLATFORMS"] == "cpu"


def test_parent_runs_inline_with_enough_devices(monkeypatch):
    """Enough CPU devices already → inline, no subprocess."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.delenv(ge._CHILD_MARK, raising=False)

    monkeypatch.setattr(jax, "devices", lambda: [object()] * 8)
    inline = {}
    monkeypatch.setattr(
        ge, "_dryrun_inline", lambda n: inline.setdefault("n", n)
    )

    def no_subprocess(*a, **k):
        raise AssertionError("re-exec'd despite having enough devices")

    monkeypatch.setattr(ge.subprocess, "run", no_subprocess)

    ge.dryrun_multichip(8)

    assert inline["n"] == 8


def test_child_mark_failure_is_loud(monkeypatch):
    """A child that still sees too few devices must raise, not recurse."""
    monkeypatch.setenv(ge._CHILD_MARK, "1")
    monkeypatch.setattr(jax, "devices", lambda: [object()])

    import pytest

    with pytest.raises(RuntimeError, match="not honored"):
        ge.dryrun_multichip(8)
