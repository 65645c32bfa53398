"""Telemetry recording: named scalar columns collected inside the rollout scan.

Reference equivalent: `TelemetryData/Sender/Recorder` (`core/src/telemetry/`) —
variables registered by name, snapshotted every controller period.  Here the
snapshot IS the scan output: zero-copy on device, flushed to host once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine.engine import Engine
from jiminy_tpu.engine.state import SimState


@dataclasses.dataclass
class LogData:
    """Parsed telemetry log (reference `LogData`, `jiminy_py/log.py`)."""

    constants: Dict[str, str]
    variables: Dict[str, np.ndarray]  # name -> (T,) column

    @property
    def time(self) -> np.ndarray:
        return self.variables["Global.Time"]


class TelemetryRecorder:
    """Registers the fields to record and turns a rollout into a `LogData`.

    Default field set mirrors the reference engine telemetry options
    (`enableConfiguration/Velocity/Acceleration/Effort/ForceExternal/Energy`).
    """

    def __init__(
        self,
        engine: Engine,
        configuration: bool = True,
        velocity: bool = True,
        acceleration: bool = False,
        command: bool = True,
        contact_forces: bool = True,
        sensors: bool = True,
        custom: Optional[Dict[str, Callable[[SimState], jnp.ndarray]]] = None,
    ):
        self.engine = engine
        robot = engine.robot
        model = robot.model
        self.fields: Dict[str, Callable[[SimState], jnp.ndarray]] = {}
        self.fields["Global.Time"] = lambda s: s.t
        prefix = robot.name

        def q_getter(i):
            return lambda s: s.q[..., i]

        def v_getter(i):
            return lambda s: s.v[..., i]

        def a_getter(i):
            return lambda s: s.a[..., i]

        if configuration:
            for i in range(model.nq):
                self.fields[f"{prefix}.currentPositionQ{i}"] = q_getter(i)
        if velocity:
            for i in range(model.nv):
                self.fields[f"{prefix}.currentVelocityV{i}"] = v_getter(i)
        if acceleration:
            for i in range(model.nv):
                self.fields[f"{prefix}.currentAccelerationA{i}"] = a_getter(i)
        if command and robot.motors is not None:
            for k, name in enumerate(robot.motors.names):
                self.fields[f"{prefix}.currentEffort{name}"] = (
                    lambda s, k=k: s.u_motor[..., k]
                )
        if contact_forces:
            for k, fidx in enumerate(robot.contact_frame_indices):
                fname = model.frame_names[fidx]
                for ax, axn in enumerate("XYZ"):
                    self.fields[f"{prefix}.contact{fname}.F{axn}"] = (
                        lambda s, k=k, ax=ax: s.contact_forces[..., k, ax]
                    )
        if sensors:
            for gname, group in robot.sensors.groups():
                for si, sname in enumerate(group.names):
                    for fi, fn in enumerate(group.fieldnames):
                        self.fields[f"{prefix}.{gname}.{sname}.{fn}"] = (
                            lambda s, g=gname, si=si, fi=fi: s.measurements[g][
                                ..., si, fi
                            ]
                        )
        if custom:
            self.fields.update(custom)

    # ------------------------------------------------------------------ #
    def snapshot(self, state: SimState) -> Dict[str, jnp.ndarray]:
        return {name: fn(state) for name, fn in self.fields.items()}

    def record(
        self,
        state: SimState,
        n_steps: int,
        policy: Optional[Callable] = None,
    ):
        """Roll the engine `n_steps` controller periods, recording every field
        per step.  Returns (final_state, LogData)."""

        def body(st, _):
            cmd = policy(st) if policy is not None else None
            st = self.engine.step(st, cmd)
            return st, self.snapshot(st)

        timeout = getattr(self.engine.options.stepper, "timeout", 0.0)
        if timeout and timeout > 0.0:
            # Wall-clock budget (reference `engine.cc:2379-2384`): a jitted
            # scan cannot observe host time, so dispatch in chunks and check
            # the clock between them.
            import time

            chunk_len = max(1, min(n_steps, 32))
            chunk = jax.jit(
                lambda st: jax.lax.scan(body, st, None, length=chunk_len)
            )
            t_start = time.monotonic()
            final, parts, done = state, [], 0
            while done < n_steps:
                if time.monotonic() - t_start > timeout:
                    raise TimeoutError(
                        "Step computation timeout. Aborting integration "
                        f"(timeout={timeout}s after {done}/{n_steps} steps)."
                    )
                take = min(chunk_len, n_steps - done)
                if take == chunk_len:
                    final, cols = chunk(final)
                else:
                    final, cols = jax.lax.scan(body, final, None, length=take)
                jax.block_until_ready(final)
                parts.append(cols)
                done += take
            variables = {
                k: np.concatenate([np.asarray(p[k]) for p in parts])
                for k in parts[0]
            }
        else:
            final, cols = jax.lax.scan(body, state, None, length=n_steps)
            variables = {k: np.asarray(v) for k, v in cols.items()}
        constants = self._constants()
        return final, LogData(constants=constants, variables=variables)

    def _constants(self) -> Dict[str, str]:
        from jiminy_tpu.io.serialization import to_json

        robot = self.engine.robot
        return {
            "robot": to_json(robot),
            "engine_options": to_json_options(self.engine.options),
            "jiminy_tpu.version": _version(),
        }


def to_json_options(options) -> str:
    import json

    return json.dumps(options.to_dict())


def _version() -> str:
    import jiminy_tpu

    return jiminy_tpu.__version__


def record_rollout(
    engine: Engine,
    state: SimState,
    n_steps: int,
    policy: Optional[Callable] = None,
    **recorder_kwargs: Any,
):
    """One-shot convenience: record a rollout with the default field set."""
    rec = TelemetryRecorder(engine, **recorder_kwargs)
    return rec.record(state, n_steps, policy)
