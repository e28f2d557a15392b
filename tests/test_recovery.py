"""Failure recovery: checkpoint-restart as the multi-host recovery unit
(SURVEY.md §5 "Failure detection / elastic recovery": adopt Orbax
checkpoint-restart; fault = process death, recovery = fresh cluster
restoring the carry). Verifies a restarted 2-process cluster continues
BIT-IDENTICALLY to an uninterrupted run."""

import json

import numpy as np
import pytest

from jiminy_tpu.rl.launch import launch_cpu_ring

_BODY = """
import json, sys
import jax, jax.numpy as jnp, numpy as np
from jiminy_tpu.envs import CartPoleEnv
from jiminy_tpu.rl import PPOConfig
from jiminy_tpu.rl.distributed import make_distributed_train
from jiminy_tpu.rl.launch import global_mesh
from jiminy_tpu.checkpoint import save_checkpoint, restore_checkpoint

MODE = {mode!r}
CKPT = {ckpt!r}
mesh = global_mesh()
cfg = PPOConfig(num_envs=32, rollout_len=4, minibatches=2, epochs=1,
                hidden=(16, 16))
init_fn, step, policy = make_distributed_train(CartPoleEnv(), cfg, mesh)
carry = init_fn(jax.random.PRNGKey(0))
if MODE == "uninterrupted":
    for _ in range(4):
        carry, m = step(carry)
elif MODE == "phase1":
    for _ in range(2):
        carry, m = step(carry)
    # every process participates in the save (orbax coordinates)
    save_checkpoint(CKPT, carry)
else:  # phase2: fresh cluster, restore, continue
    carry = restore_checkpoint(CKPT, carry)
    for _ in range(2):
        carry, m = step(carry)
W = np.asarray(carry[0]["actor"][0][0])
print("DIGEST", float(np.sum(W)), float(np.sum(np.abs(W))))
"""


def _digest(outs):
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("DIGEST")][-1]
        return line
    raise AssertionError("no digest")


@pytest.mark.slow
class TestCheckpointRestart:
    def test_restart_continues_bit_identically(self, tmp_path):
        ckpt = str(tmp_path / "ck")
        ref = _digest(
            launch_cpu_ring(
                2, _BODY.format(mode="uninterrupted", ckpt=ckpt),
                local_devices=2, port=12789,
            )
        )
        launch_cpu_ring(
            2, _BODY.format(mode="phase1", ckpt=ckpt),
            local_devices=2, port=12791,
        )
        # the phase-1 cluster is gone (fault = all processes died);
        # a brand-new cluster restores the carry and continues
        got = _digest(
            launch_cpu_ring(
                2, _BODY.format(mode="phase2", ckpt=ckpt),
                local_devices=2, port=12793,
            )
        )
        assert got == ref
