"""Seeded random-config parity checks (distilled from scripts/fuzz_golden.py).

The fuzzer draws a random MapperConfig (geometry, mount pose, thresholds,
log-odds parameters, z-filter, adaptive update), a random trajectory, and
random sparse pings, then requires EXACT float64 agreement between the
golden oracle and the device engines (hash per-frame, hash windowed,
brick).  The full sweep runs offline (100+ seeds clean so far); these
pinned seeds keep a slice of that configuration-space coverage in every
suite run at ~1 min total.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts")
)

from fuzz_golden import run_trial  # noqa: E402


@pytest.mark.parametrize("seed", [1002, 2016, 2048])
def test_random_config_parity(seed):
    msg = run_trial(seed)
    assert msg.startswith("ok"), msg
