"""TPU-native (Pallas) kernels for the engine's hot ops.

The engine's default compute path is pure XLA (which fuses the substep
well — see docs/tpu_performance.md). The kernels here cover the cases
where an explicit VMEM-resident formulation beats XLA's lowering: the
batched constraint solve chain, whose small-matrix loops XLA executes as
long chains of tiny padded ops.
"""

from jiminy_tpu.ops.constraint_solve import (  # noqa: F401
    SolveConfig,
    make_constraint_solver,
    solve_batched_pallas,
    solve_reference,
)
