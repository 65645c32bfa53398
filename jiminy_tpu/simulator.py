"""Simulator: the single-entry convenience facade (reference
`jiminy_py.simulator.Simulator`, `python/jiminy_py/src/jiminy_py/simulator.py`).

Build a robot from URDF + hardware TOML, configure the engine from TOML/JSON,
seed, run simulations, record/export logs, and plot — while everything under the
hood stays pure-functional (the facade owns the current `SimState`)."""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jiminy_tpu.engine import Engine, EngineOptions, Robot
from jiminy_tpu.engine.state import SimState
from jiminy_tpu.hardware import load_hardware_description_file
from jiminy_tpu.telemetry import LogData, TelemetryRecorder, write_hdf5, write_log


class Simulator:
    """Single-robot simulation facade.

    - `Simulator.build(urdf, hardware_path=None, ...)` (reference
      `Simulator.build`, simulator.py:197)
    - `seed`, `start`, `step`, `simulate`, `stop`, `write_log`
    - `export_options` / `import_options` TOML/JSON round trip
      (reference simulator.py:995-1062)
    """

    def __init__(self, robot: Robot, options: Optional[EngineOptions] = None):
        self.robot = robot
        self.engine = Engine(robot, options)
        self.state: Optional[SimState] = None
        self._seed = 0
        self._recorder: Optional[TelemetryRecorder] = None
        self._log: Optional[LogData] = None
        self._is_running = False

    # ------------------------------------------------------------------ #
    @staticmethod
    def build(
        urdf_path: str,
        hardware_path: Optional[str] = None,
        has_freeflyer: bool = False,
        options: Optional[EngineOptions] = None,
        config_path: Optional[str] = None,
        **robot_kwargs,
    ) -> "Simulator":
        """Build from a URDF and optional `*_hardware.toml` / `*_options.toml`
        files (reference `BaseJiminyRobot` + hardware file, `robot.py:518`).

        Both sidecar files are auto-discovered next to the URDF when not given
        explicitly, like the reference does (`robot.py:850+`,
        `Simulator.build` config_path handling): `*_options.toml` uses the
        reference schema (`[engine.stepper]`, `[engine.contacts]`, ...) and is
        translated by `engine_options_from_reference_toml`; explicit
        ``options`` win over the file."""
        if hardware_path is None:
            guess = os.path.splitext(urdf_path)[0] + "_hardware.toml"
            hardware_path = guess if os.path.exists(guess) else None
        if options is None:
            if config_path is None:
                guess = os.path.splitext(urdf_path)[0] + "_options.toml"
                config_path = guess if os.path.exists(guess) else None
            if config_path is not None:
                from jiminy_tpu.engine.config import (
                    engine_options_from_reference_toml,
                )

                options = engine_options_from_reference_toml(config_path)
        hw = load_hardware_description_file(hardware_path) if hardware_path else {}
        robot = Robot.build(
            urdf_path,
            has_freeflyer=hw.get("has_freeflyer", has_freeflyer),
            motors=hw.get("motors", ()),
            sensors=hw.get("sensors", None),
            contact_frames=hw.get("contact_frames", ()),
            collision_bodies=hw.get("collision_bodies", ()),
            flexibility=hw.get("flexibility", ()),
            loop_constraints=hw.get("loop_constraints", ()),
            **robot_kwargs,
        )
        return Simulator(robot, options)

    # ------------------------------------------------------------------ #
    def seed(self, seed: int) -> None:
        """Reseed the simulation RNG (reference `Simulator.seed`, :525)."""
        self._seed = int(seed)

    def register_impulse_force(self, *args, **kwargs) -> None:
        """Forward to `Engine.register_impulse_force` (reference
        `Simulator.register_impulse_force`, simulator.py:499).  Must be called
        before `start` — forces are baked into the jitted step."""
        if self._is_running:
            raise RuntimeError("register forces before starting the simulation")
        self.engine.register_impulse_force(*args, **kwargs)

    def register_profile_force(self, *args, **kwargs) -> None:
        """Forward to `Engine.register_profile_force` (reference
        `Simulator.register_profile_force`, simulator.py:458)."""
        if self._is_running:
            raise RuntimeError("register forces before starting the simulation")
        self.engine.register_profile_force(*args, **kwargs)

    def reset(self, remove_all_forces: bool = False) -> None:
        """Drop the current simulation state (reference `Simulator.reset`,
        simulator.py:547); optionally clear registered forces."""
        self.state = None
        self._is_running = False
        if remove_all_forces:
            self.engine.remove_forces()

    def close(self) -> None:
        """Release the facade's state (reference `Simulator.close`)."""
        self.reset()
        self._log = None
        self._recorder = None

    def start(self, q_init, v_init=None) -> None:
        """Initialize a new simulation (reference `Simulator.start`)."""
        key = jax.random.PRNGKey(self._seed)
        self.state = self.engine.reset(jnp.asarray(q_init), v_init, key=key)
        self._recorder = TelemetryRecorder(self.engine)
        self._columns = []
        self._is_running = True
        self._step_jit = jax.jit(self.engine.step)
        self._columns.append(self._recorder.snapshot(self.state))

    def step(self, command=None) -> SimState:
        if not self._is_running:
            raise RuntimeError("No simulation running — call `start` first.")
        self.state = self._step_jit(self.state, command)
        self._columns.append(self._recorder.snapshot(self.state))
        return self.state

    def simulate(
        self,
        t_end: float,
        q_init,
        v_init=None,
        callback: Optional[Callable] = None,
    ) -> LogData:
        """Run a complete simulation (reference `Simulator.simulate`, :605)."""
        self.start(q_init, v_init)
        n_steps = int(round(t_end / self.engine.control_period))
        final, log = self._recorder.record(self.state, n_steps)
        self.state = final
        self._log = log
        self._is_running = False
        return log

    def stop(self) -> LogData:
        """Finalize and collect the log of a stepped simulation."""
        self._is_running = False
        if self._columns:
            import numpy as _np

            variables = {
                k: _np.asarray(jnp.stack([c[k] for c in self._columns]))
                for k in self._columns[0]
            }
            self._log = LogData(constants=self._recorder._constants(), variables=variables)
        return self._log

    @property
    def log_data(self) -> Optional[LogData]:
        return self._log

    def write_log(self, path: str, format: str = "binary") -> None:
        """Export the last log (reference `Engine::writeLog`: binary or HDF5)."""
        if self._log is None:
            raise RuntimeError("no log recorded")
        if format in ("binary", "tlmc"):
            write_log(path, self._log)
        elif format == "hdf5":
            write_hdf5(path, self._log)
        else:
            raise ValueError(f"unknown log format {format}")

    # ------------------------------------------------------------------ #
    def export_options(self, path: str) -> None:
        d = self.engine.options.to_dict()
        if path.endswith(".json"):
            with open(path, "w") as f:
                json.dump(d, f, indent=2)
        else:
            _write_toml(path, d)

    def import_options(self, path: str) -> None:
        if path.endswith(".json"):
            with open(path) as f:
                d = json.load(f)
        else:
            import tomllib

            with open(path, "rb") as f:
                d = tomllib.load(f)
        self.engine = Engine(self.robot, EngineOptions.from_dict(d))

    def plot(self, **kwargs):
        """Standard telemetry plots (reference `Simulator.plot`, :945)."""
        from jiminy_tpu.plot import plot_log

        if self._log is None:
            raise RuntimeError("no log recorded")
        return plot_log(self._log, **kwargs)

    def render(self, path: Optional[str] = None):
        """Render the current configuration (reference `Simulator.render`)."""
        from jiminy_tpu.viewer import Viewer

        if self.state is None:
            raise RuntimeError("no simulation state — call `start` first")
        viewer = Viewer(self.robot)
        if path is not None:
            return viewer.save_frame(self.state.q, path, ground_fn=self.engine.ground_fn)
        return viewer.render(self.state.q, ground_fn=self.engine.ground_fn)

    def replay(self, output_path: Optional[str] = None, fps: float = 25.0):
        """Replay the last simulation (reference `Simulator.replay`).

        `output_path` ending in ``.glb`` exports a self-contained glTF 2.0
        animation (openable in any glTF viewer — the headless-pod equivalent
        of the reference's meshcat/panda3d replay); ``.html`` embeds that glb
        in a standalone browser player (meshcat-equivalent, serverless); any
        other extension goes through the matplotlib GIF backend.
        """
        from jiminy_tpu.telemetry import extract_trajectory_from_log
        from jiminy_tpu.viewer import export_gltf, export_html, play_trajectories

        if self._log is None:
            raise RuntimeError("no log recorded")
        traj = extract_trajectory_from_log(self._log)
        if output_path is not None and output_path.endswith(".html"):
            return export_html(
                traj, output_path, robot=self.robot, fps=fps,
                ground_fn=self.engine.ground_fn,
            )
        if output_path is not None and output_path.endswith(".glb"):
            return export_gltf(
                traj, output_path, robot=self.robot, fps=fps,
                ground_fn=self.engine.ground_fn,
            )
        return play_trajectories(
            [traj], output_path=output_path, fps=fps, ground_fn=self.engine.ground_fn
        )


def _write_toml(path: str, d: dict, prefix: str = "") -> None:
    """Minimal TOML writer for nested dicts of scalars."""
    lines = []

    def emit(d, prefix):
        scalars = {
            k: v for k, v in d.items() if not isinstance(v, dict) and v is not None
        }
        tables = {k: v for k, v in d.items() if isinstance(v, dict)}
        if prefix and scalars:
            lines.append(f"[{prefix}]")
        for k, v in scalars.items():
            if isinstance(v, bool):
                sv = "true" if v else "false"
            elif isinstance(v, str):
                sv = f'"{v}"'
            elif isinstance(v, (list, tuple)):
                sv = "[" + ", ".join(str(float(x)) for x in v) + "]"
            else:
                sv = repr(v)
            lines.append(f"{k} = {sv}")
        for k, v in tables.items():
            lines.append("")
            emit(v, f"{prefix}.{k}" if prefix else k)

    emit(d, prefix)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


class MultiSimulator:
    """Multi-robot simulation facade over `MultiRobotEngine` (reference
    multi-robot `Simulator` usage: `Simulator.add_robot`, `simulator.py:288`,
    with coupling forces registered on the shared engine).

    Usage::

        sim = MultiSimulator({"a": robot_a, "b": robot_b})
        sim.register_viscoelastic_coupling_force("a", "tip", "b", "tip",
                                                 stiffness, damping)
        sim.start({"a": qa, "b": qb})
        sim.step()                    # lock-step, all robots
    """

    def __init__(self, robots, options: Optional[EngineOptions] = None):
        from jiminy_tpu.engine.multi import MultiRobotEngine

        self.engine = MultiRobotEngine(dict(robots), options)
        self.names = self.engine.names
        self.states = None
        self._seed = 0
        self._is_running = False

    def add_robot(self, name: str, robot: Robot) -> None:
        """Add another robot before starting (reference `Simulator.add_robot`)."""
        if self._is_running:
            raise RuntimeError("cannot add a robot while a simulation is running")
        from jiminy_tpu.engine.multi import MultiRobotEngine

        robots = {n: self.engine.robots[n] for n in self.names}
        robots[name] = robot
        couplings = self.engine.couplings
        self.engine = MultiRobotEngine(robots, self.engine.options)
        self.engine.replay_couplings(couplings)
        self.names = self.engine.names

    def register_viscoelastic_coupling_force(self, *args, **kwargs) -> None:
        self.engine.register_viscoelastic_coupling_force(*args, **kwargs)

    def register_coupling_force(self, *args, **kwargs) -> None:
        self.engine.register_coupling_force(*args, **kwargs)

    def seed(self, seed: int) -> None:
        self._seed = int(seed)

    def start(self, q_inits, v_inits=None) -> None:
        key = jax.random.PRNGKey(self._seed)
        self.states = self.engine.reset(q_inits, v_inits, key=key)
        self._step_jit = jax.jit(self.engine.step)
        self._is_running = True

    def step(self, commands=None):
        if not self._is_running:
            raise RuntimeError("No simulation running — call `start` first.")
        self.states = self._step_jit(self.states, commands)
        return self.states

    def simulate(self, t_end: float, q_inits, v_inits=None, policy=None):
        """Run `t_end` seconds; returns the per-robot (t, q, v) trajectories."""
        self.start(q_inits, v_inits)
        n_steps = int(round(t_end / self.engine.sensor_period))
        traj = {n: [] for n in self.names}
        for _ in range(n_steps):
            cmds = policy(self.states) if policy is not None else None
            self.step(cmds)
            for n in self.names:
                st = self.states[n]
                traj[n].append((np.asarray(st.t), np.asarray(st.q), np.asarray(st.v)))
        self._is_running = False
        return {
            n: {
                "t": np.stack([e[0] for e in rows]),
                "q": np.stack([e[1] for e in rows]),
                "v": np.stack([e[2] for e in rows]),
            }
            for n, rows in traj.items()
        }
