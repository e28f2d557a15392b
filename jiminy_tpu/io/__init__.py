from jiminy_tpu.io.urdf import load_urdf, parse_urdf

__all__ = ["load_urdf", "parse_urdf"]
