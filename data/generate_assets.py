"""Write the bundled robot descriptions to disk as URDF + hardware TOML.

Reference layout: jiminy ships ``data/`` with URDF + ``*_hardware.toml``
per robot (SURVEY.md §1 "Assets"). Our models are authored as parameterized
generators; this script materializes them so users can follow the
file-based workflow (``Simulator.build("data/anymal.urdf",
"data/anymal_hardware.toml")``) and to exercise the TOML parsing path.

Run: python data/generate_assets.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

HERE = pathlib.Path(__file__).parent


def _toml_value(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    return f'"{v}"'


def _toml_key(k: str) -> str:
    """Quote keys that are not bare TOML keys (dots, signs, …)."""
    import re

    return k if re.fullmatch(r"[A-Za-z0-9_-]+", k) else f'"{k}"'


def write_hardware_toml(path, hw: dict) -> None:
    """Serialize a hardware dict using the reference's section layout."""
    lines = []

    def emit(prefix, d):
        scalars = {k: v for k, v in d.items() if not isinstance(v, dict)}
        subs = {k: v for k, v in d.items() if isinstance(v, dict)}
        if scalars:
            lines.append(f"[{prefix}]")
            for k, v in scalars.items():
                lines.append(f"{_toml_key(k)} = {_toml_value(v)}")
            lines.append("")
        for k, v in subs.items():
            emit(f"{prefix}.{_toml_key(k)}", v)

    for section, content in hw.items():
        emit(section, content)
    pathlib.Path(path).write_text("\n".join(lines) + "\n")


def main() -> None:
    from jiminy_tpu.models.humanoid import humanoid_hardware, humanoid_urdf
    from jiminy_tpu.models.quadruped import (
        ANYMAL,
        SPOTMICRO,
        quadruped_hardware,
        quadruped_urdf,
    )

    for params in (ANYMAL, SPOTMICRO):
        (HERE / f"{params.name}.urdf").write_text(quadruped_urdf(params))
        write_hardware_toml(
            HERE / f"{params.name}_hardware.toml", quadruped_hardware(params)
        )
    (HERE / "atlas.urdf").write_text(humanoid_urdf())
    write_hardware_toml(
        HERE / "atlas_hardware.toml", humanoid_hardware(flexibility=True)
    )
    print("assets written to", HERE)


if __name__ == "__main__":
    main()
