"""Gymnasium registration of the env zoo.

Reference: gym_jiminy registers env IDs for every bundled robot
(SURVEY.md §2.5). Call :func:`register_envs` once, then
``gymnasium.make("jiminy_tpu/ANYmal-v0")``.
"""

from __future__ import annotations

_SPECS = {
    "jiminy_tpu/CartPole-v0": ("jiminy_tpu.envs", "CartPoleEnv"),
    "jiminy_tpu/Acrobot-v0": ("jiminy_tpu.envs", "AcrobotEnv"),
    "jiminy_tpu/ANYmal-v0": ("jiminy_tpu.envs", "ANYmalEnv"),
    "jiminy_tpu/Cassie-v0": ("jiminy_tpu.envs.legged", "CassieEnv"),
    "jiminy_tpu/Atlas-v0": ("jiminy_tpu.envs.legged", "AtlasEnv"),
    "jiminy_tpu/Ant-v0": ("jiminy_tpu.envs.legged", "AntEnv"),
    "jiminy_tpu/Spotmicro-v0": ("jiminy_tpu.envs.legged", "SpotmicroEnv"),
}


def _factory(module: str, cls: str):
    def make(**kwargs):
        import importlib

        from jiminy_tpu.envs.gym_adapter import make_gym_env

        env_cls = getattr(importlib.import_module(module), cls)
        seed = kwargs.pop("seed", 0)
        return make_gym_env(env_cls(**kwargs), seed=seed)

    return make


def register_envs() -> list[str]:
    """Register all bundled envs with gymnasium; returns the IDs."""
    import gymnasium

    for env_id, (module, cls) in _SPECS.items():
        if env_id in gymnasium.registry:
            continue
        gymnasium.register(
            id=env_id, entry_point=_factory(module, cls), disable_env_checker=True
        )
    return list(_SPECS)
