"""SURVEY §2 ↔ registry 1:1 audit stays green (r9 VERDICT item 8)."""

import subprocess
import sys


def test_survey_section2_audits_clean():
    """Unique lettered ids; every §2 row key registered; every
    registered key documented in §2; oracle coverage complete modulo
    the documented rows-only exception."""
    r = subprocess.run(
        [sys.executable, "tools/survey_audit.py"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout
