"""Opt-in pytest wrapper for the hostile sweep (round-7 verdict #5).

The sweep itself lives in ``tests/hostile_sweep.py`` (one command, fresh
subprocess — the JVM captures TZ at launch so it cannot run in-session).
Wrapping it in a marked test makes it VISIBLE in every CI invocation
(collected + reported as skipped by the default gate) and runnable as

    python -m pytest -m hostile

so the Tokyo+ANSI cross-engine pass cannot silently fall out of the
release checklist. It is skipped by default (see ``conftest.py``): the
full 104-name sweep costs minutes and the default gate must stay fast.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.hostile
def test_hostile_sweep_all_queries():
    rc = subprocess.call(
        [
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "hostile_sweep.py"),
        ]
    )
    assert rc == 0, "hostile sweep reported at least one engine divergence"
