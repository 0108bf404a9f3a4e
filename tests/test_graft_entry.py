"""Driver entry points: the multichip dry run's backend-selection logic.

The dry run must never initialise jax backends in a fresh caller process:
``jax.devices()`` there brings up the remote-TPU relay link, which can hang
indefinitely when the relay is wedged (NOTES.md) — and a fresh process can
never hold >= n real chips in this environment anyway.  Only a process
whose backend is ALREADY up (like this test process, via conftest's forced
CPU platform) may consult the live device count and run in-process.
"""
import jax
import pytest

import __graft_entry__ as ge


def test_no_backend_goes_straight_to_subprocess(monkeypatch):
    calls = []
    monkeypatch.setattr(ge, "_dryrun_multichip_subprocess",
                        lambda n: calls.append(("sub", n)))
    monkeypatch.setattr(ge, "_dryrun_multichip_impl",
                        lambda n: calls.append(("impl", n)))
    # simulate a fresh process: no backend initialised yet
    from jax._src import xla_bridge as xb
    monkeypatch.setattr(xb, "_backends", {})

    def deny_devices(*a, **k):  # initialising here would touch the relay
        raise AssertionError("jax.devices() called with no backend up")

    monkeypatch.setattr(jax, "devices", deny_devices)
    ge.dryrun_multichip(8)
    assert calls == [("sub", 8)]


def test_backend_up_with_enough_devices_runs_in_process(monkeypatch):
    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices
    calls = []
    monkeypatch.setattr(ge, "_dryrun_multichip_subprocess",
                        lambda n: calls.append(("sub", n)))
    monkeypatch.setattr(ge, "_dryrun_multichip_impl",
                        lambda n: calls.append(("impl", n)))
    ge.dryrun_multichip(8)
    assert calls == [("impl", 8)]


def test_backend_up_but_too_few_devices_goes_subprocess(monkeypatch):
    calls = []
    monkeypatch.setattr(ge, "_dryrun_multichip_subprocess",
                        lambda n: calls.append(("sub", n)))
    monkeypatch.setattr(ge, "_dryrun_multichip_impl",
                        lambda n: calls.append(("impl", n)))
    ge.dryrun_multichip(len(jax.devices()) + 1)
    assert calls == [("sub", len(jax.devices()) + 1)]
