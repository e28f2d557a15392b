"""Multi-host launch: jax.distributed bring-up + the CPU-ring test rig.

Reference scale-out is Ray (driver + workers over gRPC, SURVEY.md §3.4);
here multi-host is plain SPMD: every host runs the SAME program under
``jax.distributed.initialize``, the global mesh spans all hosts, and the
collectives ride ICI/DCN. This module provides:

- :func:`initialize_cluster`: env-var/explicit bring-up for TPU pods or
  CPU rings (the N-process CPU ring is the correctness CI story from
  SURVEY.md §4 — no TPU needed).
- :func:`global_mesh`: a ("data",)-axis mesh over all addressable +
  remote devices.
- :func:`launch_cpu_ring`: spawn N local processes that each initialize
  the cluster on the CPU backend and run a worker function — used by the
  multi-host smoke test.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap


def initialize_cluster(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_count: int | None = None,
) -> None:
    """Initialize jax.distributed. On TPU pods all args resolve from the
    environment; on CPU rings pass them explicitly (or via JIMINY_TPU_*
    env vars set by :func:`launch_cpu_ring`)."""
    import jax

    coordinator = coordinator or os.environ.get("JIMINY_TPU_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("JIMINY_TPU_NPROCS", "0")) or None
    if process_id is None:
        pid = os.environ.get("JIMINY_TPU_PROC_ID")
        process_id = int(pid) if pid is not None else None
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{local_device_count}"
        ).strip()
    kwargs = {}
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data"):
    """Mesh over every device in the cluster (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(jax.devices(), (axis,))


_WORKER_TEMPLATE = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
from jiminy_tpu.rl.launch import initialize_cluster
initialize_cluster(local_device_count={local_devices})
jax.config.update("jax_platforms", "cpu")
{body}
"""


def launch_cpu_ring(
    n_procs: int,
    worker_body: str,
    local_devices: int = 2,
    timeout: float = 300.0,
    port: int = 12757,
) -> list[str]:
    """Run ``worker_body`` (python source; sees ``jax`` initialized into an
    n_procs-host CPU cluster) in N separate processes. Returns each
    process's stdout. Raises on any nonzero exit."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    src = _WORKER_TEMPLATE.format(
        repo=repo, local_devices=local_devices,
        body=textwrap.dedent(worker_body),
    )
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env.update(
            JIMINY_TPU_COORDINATOR=f"localhost:{port}",
            JIMINY_TPU_NPROCS=str(n_procs),
            JIMINY_TPU_PROC_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", src],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(
                f"cpu-ring worker failed (rc={p.returncode}):\n{out}"
            )
    return outs
