from jiminy_tpu.hardware.motors import Motors
from jiminy_tpu.hardware.sensors import (
    SensorSuite,
    imu_spec,
    encoder_spec,
    effort_spec,
    contact_spec,
    force_spec,
)

__all__ = [
    "Motors",
    "SensorSuite",
    "imu_spec",
    "encoder_spec",
    "effort_spec",
    "contact_spec",
    "force_spec",
]
