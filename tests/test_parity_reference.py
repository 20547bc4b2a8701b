"""CI guard for the differential parity harness (tools/parity_check.py):
reference math (executed from /root/reference) == ours, quick grid."""

import os
import subprocess
import sys

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists(REF), reason="no reference checkout")
def test_parity_harness_quick(tmp_path):
    out = str(tmp_path / "PARITY.md")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_check.py"),
         "--quick", "--out", out],
        capture_output=True,
        text=True,
        timeout=520,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    text = open(out).read()
    assert "ALL OK" in text
    assert "FAIL" not in text.replace("FAILURES", "")
