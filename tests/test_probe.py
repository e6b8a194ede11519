"""Device-liveness probe (utils/probe.py): positive path on the test
backend; the stalled path was verified against a live tunnel outage
(SystemExit in bounded time — bench.py/family_bench call it up front)."""

import pytest

from fcsr_tpu.utils.probe import require_live_device


def test_probe_passes_on_live_backend():
    require_live_device(timeout_s=60)  # CPU: sub-second


def test_probe_message_names_the_runbook(monkeypatch):
    # force the wait to expire instantly: the probe thread cannot set
    # the event before a zero timeout is checked... it can on a fast
    # machine, so patch the threading Event wait instead
    import fcsr_tpu.utils.probe as P

    class NeverSet:
        def set(self):
            pass

        def is_set(self):
            return False

        def wait(self, timeout=None):
            return False

    monkeypatch.setattr(P.threading, "Event", lambda: NeverSet())
    with pytest.raises(SystemExit, match="tpu_probe"):
        require_live_device(timeout_s=0.01)
