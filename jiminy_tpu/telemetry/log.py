"""Log file IO: native TLMC binary format + HDF5, robot reconstruction.

Reference equivalents: `TelemetryRecorder::writeLog/readLog`
(`core/src/telemetry/telemetry_recorder.cc:121-331`), the TLMC spec
(`docs/spec/src/tlmc_format_specification.md`), and `jiminy_py.log`
(`build_robot_from_log` :87, `extract_trajectory_from_log` :189).
"""

from __future__ import annotations

import ctypes
from typing import Dict

import numpy as np

from jiminy_tpu.telemetry.recorder import LogData

_DTYPES = {0: np.float32, 1: np.float64, 2: np.int64}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.float64): 1, np.dtype(np.int64): 2}


def write_log(path: str, log: LogData, compress_level: int = 4) -> None:
    """Write a LogData to the native TLMC binary format."""
    from jiminy_tpu.native import load_tlmc

    lib = load_tlmc()
    const_items = sorted(log.constants.items())
    n_const = len(const_items)
    ckeys = (ctypes.c_char_p * n_const)(*[k.encode() for k, _ in const_items])
    cvals_bytes = [
        v.encode() if isinstance(v, str) else bytes(v) for _, v in const_items
    ]
    cvals = (ctypes.c_char_p * n_const)(*cvals_bytes)
    clens = (ctypes.c_uint64 * n_const)(*[len(b) for b in cvals_bytes])

    names = list(log.variables.keys())
    arrays = []
    dtypes = []
    rows = []
    for name in names:
        arr = np.ascontiguousarray(log.variables[name])
        if arr.dtype not in _DTYPE_CODES:
            arr = arr.astype(np.float64)
        arrays.append(arr)
        dtypes.append(_DTYPE_CODES[arr.dtype])
        rows.append(arr.size)
    n_vars = len(names)
    vnames = (ctypes.c_char_p * n_vars)(*[n.encode() for n in names])
    vdata = (ctypes.c_void_p * n_vars)(
        *[arr.ctypes.data_as(ctypes.c_void_p) for arr in arrays]
    )
    vdt = (ctypes.c_uint8 * n_vars)(*dtypes)
    vrows = (ctypes.c_uint64 * n_vars)(*rows)
    err = lib.tlmc_write(
        path.encode(), ckeys, cvals, clens, n_const, vnames, vdata, vdt, vrows,
        n_vars, compress_level,
    )
    if err:
        raise IOError(f"tlmc_write failed with code {err} for {path}")


def read_log(path: str) -> LogData:
    """Read a native TLMC binary log."""
    from jiminy_tpu.native import load_tlmc

    lib = load_tlmc()
    handle = lib.tlmc_open(path.encode())
    if not handle:
        raise IOError(f"cannot open log file {path}")
    try:
        constants: Dict[str, str] = {}
        for i in range(lib.tlmc_num_constants(handle)):
            key = lib.tlmc_constant_key(handle, i).decode()
            vlen = ctypes.c_uint64()
            ptr = lib.tlmc_constant_value(handle, i, ctypes.byref(vlen))
            raw = ctypes.string_at(ptr, vlen.value)
            try:
                constants[key] = raw.decode()
            except UnicodeDecodeError:
                constants[key] = raw  # keep binary constants as bytes
        variables: Dict[str, np.ndarray] = {}
        for i in range(lib.tlmc_num_vars(handle)):
            name = lib.tlmc_var_name(handle, i).decode()
            dt = _DTYPES[lib.tlmc_var_dtype(handle, i)]
            n = lib.tlmc_var_rows(handle, i)
            out = np.empty(n, dtype=dt)
            lib.tlmc_var_read(handle, i, out.ctypes.data_as(ctypes.c_void_p))
            variables[name] = out
        return LogData(constants=constants, variables=variables)
    finally:
        lib.tlmc_close(handle)


def write_hdf5(path: str, log: LogData) -> None:
    """HDF5 export (layout mirrors the reference's TLMC-in-HDF5: constants as
    attributes, one gzip+shuffle dataset per variable)."""
    import h5py

    with h5py.File(path, "w") as f:
        cgrp = f.create_group("constants")
        for k, v in log.constants.items():
            cgrp.attrs[k] = v
        vgrp = f.create_group("variables")
        for name, arr in log.variables.items():
            vgrp.create_dataset(
                name.replace("/", "|"), data=arr, compression="gzip", shuffle=True
            )


def read_hdf5(path: str) -> LogData:
    import h5py

    with h5py.File(path, "r") as f:
        constants = {k: v for k, v in f["constants"].attrs.items()}
        variables = {
            name.replace("|", "/"): np.asarray(ds)
            for name, ds in f["variables"].items()
        }
    return LogData(constants=constants, variables=variables)


def build_robot_from_log(log: LogData):
    """Rebuild the exact Robot embedded in a log (reference `log.py:87`)."""
    from jiminy_tpu.io.serialization import from_json

    return from_json(log.constants["robot"])


def extract_trajectory_from_log(log: LogData):
    """Rebuild a (t, q, v) Trajectory from the recorded columns (reference
    `log.py:189`)."""
    from jiminy_tpu.telemetry.trajectory import Trajectory

    robot = build_robot_from_log(log)
    model = robot.model
    prefix = robot.name
    t = log.variables["Global.Time"]
    q = np.stack(
        [log.variables[f"{prefix}.currentPositionQ{i}"] for i in range(model.nq)],
        axis=-1,
    )
    v = np.stack(
        [log.variables[f"{prefix}.currentVelocityV{i}"] for i in range(model.nv)],
        axis=-1,
    )
    return Trajectory(times=t, qs=q, vs=v, robot=robot)


def extract_variables_from_log(log: LogData, fieldnames, namespace: str = ""):
    """Columns for the given fieldnames, optionally under a namespace prefix
    (reference `log.py extract_variables_from_log`): returns a list of (T,)
    arrays in fieldname order; raises KeyError listing any missing name."""
    full = [f"{namespace}.{n}" if namespace else n for n in fieldnames]
    missing = [n for n in full if n not in log.variables]
    if missing:
        raise KeyError(f"variables not in log: {missing}")
    return [log.variables[n] for n in full]


def build_robots_from_log(log: LogData):
    """All robots embedded in a log (reference `log.py build_robots_from_log`).

    Multi-robot simulations run on ONE merged-forest engine here
    (`engine/merge.py`), so a log embeds a single merged robot; per-robot
    telemetry namespaces remain addressable by name."""
    return [build_robot_from_log(log)]


def extract_trajectories_from_log(log: LogData):
    """{robot name: Trajectory} for every robot in the log (reference
    `log.py extract_trajectories_from_log`)."""
    traj = extract_trajectory_from_log(log)
    return {traj.robot.name: traj}


def update_sensor_measurements_from_log(log: LogData, robot=None):
    """Closure `t -> {sensor_type: (n, fields) array}` replaying the recorded
    sensor measurements with zero-order hold (role of the reference's
    `update_sensor_measurements_from_log`, `log.py:298` — there it patches the
    viewer's sensor refresh during replay; here the returned function serves
    the same per-time lookup for replay/plot consumers)."""
    robot = robot or build_robot_from_log(log)
    t_grid = log.time
    # Columns are registered as "<robot>.<type>.<sensor name>.<field>"
    # (recorder.py: f"{prefix}.{gname}.{sname}.{fn}").  The log's dict order
    # is alphabetical (jax pytrees sort dict keys through the scan), so the
    # canonical sensor/field layout comes from the robot's sensor suite —
    # exactly the measurement-array layout of `SimState.measurements`.
    banks, layout = {}, {}
    for gname, group in robot.sensors.groups():
        snames, fields = list(group.names), list(group.fieldnames)
        bank = np.zeros((len(t_grid), len(snames), len(fields)))
        found = False
        for i, sname in enumerate(snames):
            for j, field in enumerate(fields):
                col = log.variables.get(f"{robot.name}.{gname}.{sname}.{field}")
                if col is not None:
                    bank[:, i, j] = col
                    found = True
        if found:
            banks[gname] = bank
            layout[gname] = {"sensors": snames, "fields": fields}

    def at(t: float):
        k = int(np.clip(np.searchsorted(t_grid, t, side="right") - 1, 0,
                        len(t_grid) - 1))
        return {stype: bank[k] for stype, bank in banks.items()}

    at.layout = layout  # column semantics for consumers
    return at
