"""Wedge watchdog (bench.pinned_cell): the PythonRunner flow-control
deadlock leaves a cell burning ~0 CPU forever — unrescuable in local mode
(speculation only starts when !isLocal), so an unwatched cell would stall
the whole round artifact. The watchdog must (a) KILL an idle cell at its
budget and raise after the single retry, and (b) NOT kill a healthy cell
that is merely slow in a contended window — it samples the cell session's
CPU burn at the budget and extends busy cells up to a 3x hard cap.

(b)'s live path — a real sha2 cell finishing 5x over a 5s budget via
extensions — is exercised by the bench itself and was verified manually;
a pytest for it would cost a full JVM spin-up per run, so only the
discriminator and the kill path are pinned here."""

import subprocess
import sys
import time

import pytest

sys.path.insert(0, ".")
import bench  # noqa: E402


def test_idle_cell_killed_and_raises_after_retry():
    t0 = time.time()
    with pytest.raises(RuntimeError, match="wedged twice"):
        bench.pinned_cell("idle", 1, timeout_sec=3)
    wall = time.time() - t0
    # 2 attempts x (3s budget + 5s CPU sample) plus process startup —
    # well under the 3x hard cap it would burn if the idle tree were
    # misread as busy
    assert wall < 60
    # no orphaned idle cells left behind (killpg killed the session)
    out = subprocess.run(["pgrep", "-f", "bench_cell.py"],
                         capture_output=True, text=True)
    assert out.stdout.strip() == ""


def test_session_cpu_sampler_discriminates():
    idle = subprocess.Popen([sys.executable, "-c",
                             "import time; time.sleep(30)"],
                            start_new_session=True)
    busy = subprocess.Popen([sys.executable, "-c",
                             "x = 0\nwhile True: x += 1"],
                            start_new_session=True)
    try:
        time.sleep(0.5)
        i0 = bench._session_cpu_seconds(idle.pid)
        b0 = bench._session_cpu_seconds(busy.pid)
        time.sleep(2)
        assert bench._session_cpu_seconds(idle.pid) - i0 < 0.5
        assert bench._session_cpu_seconds(busy.pid) - b0 > 1.0
    finally:
        idle.kill()
        busy.kill()
