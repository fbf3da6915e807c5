import time

from qeft_tpu.utils import phase_timer, Telemetry


def test_phase_timer_records():
    t = Telemetry()
    with phase_timer("work", t):
        time.sleep(0.01)
    with phase_timer("work", t):
        time.sleep(0.01)
    s = t.summary()
    assert s["work"]["count"] == 2
    assert s["work"]["total_s"] >= 0.02
    assert "work" in t.dump()
