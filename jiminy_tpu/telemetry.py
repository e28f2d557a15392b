"""Telemetry: constants + time-series variables, binary & HDF5 logs.

Reference: jiminy's telemetry subsystem — every component registers
constants and per-step variables; a binary recorder with a constants-rich
header enables log → pandas/plot/replay workflows (SURVEY.md §2.1
"Telemetry", §5 "Metrics/logging/observability": device-side buffer
drained to host, columnar schema).

TPU redesign: variables are produced *inside* the jitted rollout as a
stacked (T, n_vars) float32 array (the device-side ring buffer is just
the scan output), then drained once to host and serialized by the native
C++ codec (``jiminy_tpu/native/telemetry_codec.cpp``) or to HDF5.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np


@dataclass
class TelemetryLog:
    """Columnar telemetry: constants + named float32 time series."""

    constants: dict = field(default_factory=dict)
    columns: dict = field(default_factory=dict)  # name → (T,) float arrays

    @property
    def time(self) -> np.ndarray:
        return self.columns.get("time")

    def __len__(self) -> int:
        for v in self.columns.values():
            return len(v)
        return 0

    def as_matrix(self) -> tuple[list, np.ndarray]:
        names = list(self.columns)
        data = np.stack(
            [np.asarray(self.columns[n], np.float32) for n in names], axis=1
        )
        return names, np.ascontiguousarray(data, np.float32)

    # ---- binary format (native codec, Python fallback is byte-identical)
    def write_binary(self, path: str | Path) -> None:
        from jiminy_tpu.native import load_codec

        names, data = self.as_matrix()
        header = json.dumps(
            {
                "constants": {k: str(v) for k, v in self.constants.items()},
                "variables": names,
                "rows": int(data.shape[0]),
                "cols": int(data.shape[1]),
            }
        ).encode()
        lib = load_codec()
        if lib is not None:
            import ctypes

            rc = lib.jtpu_write_log(
                str(path).encode(),
                header,
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                data.shape[0],
                data.shape[1],
            )
            if rc != 0:
                raise IOError(f"telemetry codec write failed: {rc}")
            return
        with open(path, "wb") as f:  # pure-Python fallback, same bytes
            f.write(b"JTPU")
            f.write(np.uint32(1).tobytes())
            f.write(np.uint64(len(header)).tobytes())
            f.write(header)
            f.write(data.tobytes())

    @staticmethod
    def read_binary(path: str | Path) -> "TelemetryLog":
        from jiminy_tpu.native import load_codec

        lib = load_codec()
        if lib is not None:
            import ctypes

            nfloats = ctypes.c_uint64(0)
            hlen = lib.jtpu_read_header(
                str(path).encode(), None, 0, ctypes.byref(nfloats)
            )
            if hlen < 0:
                raise IOError(f"telemetry codec header failed: {hlen}")
            buf = ctypes.create_string_buffer(int(hlen))
            lib.jtpu_read_header(str(path).encode(), buf, hlen, None)
            header = json.loads(buf.raw[:hlen].decode())
            data = np.empty(int(nfloats.value), np.float32)
            got = lib.jtpu_read_data(
                str(path).encode(),
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                data.size,
            )
            if got < 0:
                raise IOError(f"telemetry codec read failed: {got}")
            data = data[:got]
        else:
            raw = Path(path).read_bytes()
            assert raw[:4] == b"JTPU", "not a jiminy_tpu log"
            hlen = int(np.frombuffer(raw[8:16], np.uint64)[0])
            header = json.loads(raw[16 : 16 + hlen].decode())
            data = np.frombuffer(raw[16 + hlen :], np.float32)
        cols = header["cols"]
        rows = data.size // cols  # trust data block (appends allowed)
        data = data[: rows * cols].reshape(rows, cols)
        return TelemetryLog(
            constants=header["constants"],
            columns={n: data[:, i].copy() for i, n in enumerate(header["variables"])},
        )

    # ---- HDF5 ---------------------------------------------------------
    def write_hdf5(self, path: str | Path) -> None:
        import h5py

        with h5py.File(path, "w") as f:
            g = f.create_group("constants")
            for k, v in self.constants.items():
                g.attrs[k] = str(v)
            d = f.create_group("variables")
            for name, col in self.columns.items():
                d.create_dataset(name, data=np.asarray(col, np.float32))

    @staticmethod
    def read_hdf5(path: str | Path) -> "TelemetryLog":
        import h5py

        with h5py.File(path, "r") as f:
            constants = dict(f["constants"].attrs)
            columns = {k: np.asarray(v) for k, v in f["variables"].items()}
        return TelemetryLog(constants=constants, columns=columns)

    def to_dataframe(self):
        """Optional pandas view (reference: log → pandas workflows)."""
        import pandas as pd

        return pd.DataFrame(self.columns)


def read_log(path: str | Path) -> TelemetryLog:
    """Format-sniffing log reader (reference: jiminy_py.log.read_log)."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"JTPU":
        return TelemetryLog.read_binary(path)
    if magic[:2] == b"\x89H":
        return TelemetryLog.read_hdf5(path)
    raise ValueError(f"unrecognized log format: {path}")


def stack_log(
    times: np.ndarray,
    named_arrays: dict[str, np.ndarray],
    constants: dict | None = None,
) -> TelemetryLog:
    """Assemble a log from stacked rollout outputs: each named array is
    (T,) or (T, d) — vector channels expand to ``name.0 .. name.d-1``
    (matching the reference's per-element telemetry naming)."""
    cols: dict[str, np.ndarray] = {"time": np.asarray(times, np.float32)}
    for name, arr in named_arrays.items():
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 1:
            cols[name] = arr
        else:
            arr = arr.reshape(arr.shape[0], -1)
            for i in range(arr.shape[1]):
                cols[f"{name}.{i}"] = arr[:, i]
    return TelemetryLog(constants=constants or {}, columns=cols)
