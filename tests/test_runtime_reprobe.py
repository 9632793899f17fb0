"""Device bring-up failure handling (round-4 hardening): loud stderr,
no permanent SW latch, throttled background re-probe, watchdogged
probe. Reference parity: qzInit re-probes after failure with a
wait-count throttle (src/qatzip.c:607-610)."""

import io
import sys

import pytest

from qatzip_tpu import runtime as rt_mod
from qatzip_tpu.constants import QZ_OK, QZ_NO_HW, QZ_DUPLICATE


class _FakeProbe:
    """Scripted probe: yields (devices, error) per poll."""

    def __init__(self, script):
        self.script = list(script)
        self.polls = 0

    def poll(self, block_s=0.0):
        self.polls += 1
        if self.script:
            return self.script.pop(0)
        return None, None


class _Dev:
    platform = "faketpu"
    device_kind = "fake v5"


def _fresh_runtime(script):
    r = rt_mod.Runtime()
    r._probe = _FakeProbe(script)
    return r


def test_failed_init_is_loud_and_not_latched(monkeypatch, capsys):
    r = _fresh_runtime([(None, RuntimeError("relay dead")),
                        ([_Dev()], None)])
    assert r.init(1) == QZ_NO_HW
    err = capsys.readouterr().err
    assert "relay dead" in err          # unconditional stderr
    assert r.last_error and "relay dead" in r.last_error
    # a later explicit init re-probes and recovers (no permanent latch)
    assert r.init(1) == QZ_OK
    assert r.hw_available and r.platform == "faketpu"
    assert r.last_error is None


def test_background_reprobe_throttled(monkeypatch, capsys):
    monkeypatch.setattr(rt_mod, "REPROBE_WAIT", 4)
    r = _fresh_runtime([(None, RuntimeError("down")),
                        ([_Dev()], None)])
    assert r.init(1) == QZ_NO_HW
    # engine requests tick the throttle; the 4th attempt re-probes
    polls_before = r._probe.polls
    for _ in range(3):
        r.get_engine("deflate")
        assert not r.hw_available
    assert r._probe.polls == polls_before   # throttled — no probe yet
    r.get_engine("deflate")                  # countdown hits zero
    assert r._probe.polls == polls_before + 1
    assert r.hw_available                    # recovered
    err = capsys.readouterr().err
    assert "recovered" in err


def test_force_sw_never_probes(monkeypatch):
    monkeypatch.setenv("QZTPU_FORCE_SW", "1")
    r = _fresh_runtime([([_Dev()], None)])
    assert r.init(1) == QZ_NO_HW
    r._background_reprobe()
    assert r._probe.polls == 0
    assert not r.hw_available


def test_duplicate_init_when_up():
    r = _fresh_runtime([([_Dev()], None)])
    assert r.init(1) == QZ_OK
    assert r.init(1) == QZ_DUPLICATE


def test_probe_timeout_converts_to_sw(monkeypatch):
    """A probe that never completes (relay hang) must return within the
    watchdog bound, not wedge init."""
    import threading
    import time

    probe = rt_mod._DeviceProbe()

    def hang_forever(b):
        time.sleep(3600)

    monkeypatch.setattr(rt_mod._DeviceProbe, "poll",
                        rt_mod._DeviceProbe.poll)  # real poll
    r = rt_mod.Runtime()
    r._probe = probe
    # replace the probe thread body via a fake jax module is heavy;
    # instead start the real poll with a thread that never finishes
    probe._thread = threading.Thread(target=hang_forever, args=(None,),
                                     daemon=True)
    probe._thread.start()
    t0 = time.time()
    rc = r.init(1, block_s=0.5)
    assert rc == QZ_NO_HW
    assert time.time() - t0 < 5
    assert "hanging" in (r.last_error or "")
