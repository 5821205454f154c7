"""Signed-digit bucket-scan kernel correctness (interpret mode, toy
curve): runs scripts/signed_kernel_check.py, which reconstructs window
sums from the kernel's raw outputs with host point arithmetic — covering
the sign negation, the shifted (slot i -> weight i+1) bucket scheme, the
sink redirects (zero digits, padding, infinities) and the leftover-merge
semantics WITHOUT the pathological XLA:CPU jits of the full msm() path
(the RUN_SLOW_TESTS interpret test covers that composition)."""

import pathlib
import subprocess
import sys


def test_signed_kernel_window_sums_match_host():
    script = (
        pathlib.Path(__file__).resolve().parents[1]
        / "scripts"
        / "signed_kernel_check.py"
    )
    out = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MATCH host oracle" in out.stdout
