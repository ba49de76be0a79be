"""Timing utility tests (the WorkTimer/StageTimer observability layer)."""
import time

from se2lam_tpu.utils import StageTimer, WorkTimer


def test_work_timer():
    t = WorkTimer()
    time.sleep(0.01)
    ms = t.stop()
    assert 5.0 < ms < 1000.0
    t.start()
    # immediate stop is small but NOT compared to the sleep-backed
    # measurement above — a scheduler preemption on a loaded box could
    # exceed it and flake
    assert t.stop() < 1000.0


def test_stage_timer_report():
    st = StageTimer()
    for _ in range(3):
        with st.stage("alpha"):
            time.sleep(0.002)
    st.timed("beta", lambda: time.sleep(0.001))
    rep = st.report()
    assert "alpha" in rep and "beta" in rep
    assert len(st.samples["alpha"]) == 3
    assert len(st.samples["beta"]) == 1
    st.reset()
    assert not st.samples
