"""Math primitives: SO(3)/quaternion operations and 6-D spatial algebra."""

from jiminy_tpu.math import so3, spatial

__all__ = ["so3", "spatial"]
