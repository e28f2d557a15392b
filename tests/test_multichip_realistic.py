"""Production-shape multichip dry run — regression protection.

`__graft_entry__.dryrun_multichip(8, realistic=True)` is the one path
that exercises PRODUCTION shapes over the distributed mesh: hidden
(256, 256), rollout 32, 64 envs/device, 4 epochs × 8 minibatches with
the packed-permutation shuffle (per-device memory + minibatch sharding
+ the gather-heavy permutation). The driver's per-round check runs only
the tiny shapes, so without this test the realistic path can silently
rot (VERDICT r4 weak #3 / next #5). Slow-marked: minutes on the CPU
virtual mesh; CI's distributed job runs it.
"""

from __future__ import annotations

import pathlib
import sys

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_dryrun_multichip_realistic():
    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) >= 8, "conftest must provide 8 devices"
    # raises / asserts non-finite internally; completing IS the test
    dryrun_multichip(8, realistic=True)
