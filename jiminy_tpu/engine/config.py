"""Engine options: typed, nested, TOML-serializable configuration.

Mirrors the option surface of the reference engine (`core/include/jiminy/core/engine/
engine.h:260-340` — contacts, world, stepper, telemetry groups) as frozen dataclasses.
Static fields (enums, periods, iteration counts) shape the compiled program; float
fields that make sense to sweep per-env live in array-typed options on the robot side.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, Optional, Tuple


class ContactModel(enum.Enum):
    SPRING_DAMPER = "spring_damper"
    CONSTRAINT = "constraint"


class IntegratorType(enum.Enum):
    EULER_EXPLICIT = "euler_explicit"
    RUNGE_KUTTA_4 = "runge_kutta_4"
    RUNGE_KUTTA_DOPRI = "runge_kutta_dopri"


@dataclasses.dataclass(frozen=True)
class ContactOptions:
    """Ground reaction model (reference defaults: `engine.h:260-306`)."""

    model: ContactModel = ContactModel.SPRING_DAMPER
    stiffness: float = 1.0e6
    damping: float = 2.0e3
    friction: float = 1.0
    torsion: float = 0.0
    transition_eps: float = 1.0e-3       # [m] blending depth / constraint hysteresis
    transition_velocity: float = 1.0e-2  # [m/s] tangential regularization speed
    stabilization_freq: float = 20.0     # [Hz] Baumgarte frequency (constraint mode)


@dataclasses.dataclass(frozen=True)
class WorldOptions:
    """Gravity and ground profile. `ground_profile(xy)->(height, normal)` is a
    jittable callable resolved at trace time (the reference's `HeightmapFunction`)."""

    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
    ground_profile: Optional[Callable[..., Any]] = None  # None = flat ground z=0


@dataclasses.dataclass(frozen=True)
class StepperOptions:
    """Integrator configuration (reference defaults `engine.h:313-340`).

    TPU adaptation: instead of an event-driven adaptive loop, integration over one
    update period runs in masked lock-step — DOPRI carries a per-env dt and failure
    mask inside a bounded `lax.while_loop`; fixed-step integrators use a static
    substep count `ceil(update_period / dt_max)`.
    """

    integrator: IntegratorType = IntegratorType.RUNGE_KUTTA_4
    tol_abs: float = 1.0e-5
    tol_rel: float = 1.0e-4
    dt_max: float = 0.02
    dt_init: float = 1.0e-3              # initial adaptive dt
    dt_min: float = 1.0e-10              # clamp for adaptive dt (reference
                                         # STEPPER_MIN_TIMESTEP, constants.h)
    max_trials: int = 24                 # bound on adaptive retry loop per period
    successive_iter_failed_max: int = 1000
    # PGS constraint solver (reference `constraint_solvers.cc:15-21, 328-448`).
    # The reference caps at 100 iterations with a residual-stagnation early
    # exit; warm-started solves stagnate within a few sweeps, so its effective
    # budget is small.  With stage-chained warm starts (below), 12 fixed
    # iterations measure within f32 noise of a 64-iteration solve on ANYmal
    # constraint-mode locomotion (see docs/performance.md); 16 keeps margin
    # for impact-rich active-set flips.  Raise for dynamics studies.
    pgs_iter_max: int = 16
    pgs_tol_abs: float = 1.0e-8
    pgs_tol_rel: float = 1.0e-6
    pgs_regularization: float = 1.0e-3
    # Thread the multipliers + active-set hysteresis through every solver
    # stage (each RK stage warm-starts from the previous stage's solution) —
    # the reference semantics, where `constraint->lambda_` and the constraint
    # enable flags persist across every `SolveBoxedForwardDynamics` call
    # (`constraint_solvers.cc:344,436-444`).  False freezes them at the
    # engine-tick start instead (cheaper to trace, slightly laxer warm start).
    pgs_stage_warm_start: bool = True
    # Wall-clock budget [s] for one `Simulator.simulate` call; <= 0 disables.
    # Enforced between jitted chunks on the host (the reference checks it in
    # its host stepping loop, `engine.cc:2379-2384`) — a jitted region cannot
    # observe wall time, so the granularity is one dispatch chunk.
    timeout: float = 0.0


@dataclasses.dataclass(frozen=True)
class EngineOptions:
    contacts: ContactOptions = dataclasses.field(default_factory=ContactOptions)
    world: WorldOptions = dataclasses.field(default_factory=WorldOptions)
    stepper: StepperOptions = dataclasses.field(default_factory=StepperOptions)
    # Discrete update period of controller command and sensor measurements [s].
    # 0.0 means "continuous" in the reference; here the engine always advances by
    # one update period per call (the caller picks the cadence), so this is the
    # atomic step of `Engine.step`.
    controller_update_period: float = 1.0e-3
    sensor_update_period: float = 1.0e-3
    # Joint position limits: "constraint" = PGS JointConstraint (reference
    # behavior), "penalty" = stable spring-damper with per-joint gains scaled by
    # the apparent joint inertia (enables the fused component-wise fast path),
    # "none" = unconstrained.
    joint_bounds_mode: str = "constraint"
    joint_bounds_freq: float = 20.0  # [Hz] penalty natural frequency
    # Use the fused component-wise dynamics core when the model supports it
    # (spring-damper contacts, 1-dof joints + optional free-flyer root).
    # True = auto (TPU/GPU only: the large fused graph compiles slowly on the
    # CPU backend), "always" = force on, False = off.
    use_fast_dynamics: object = True
    # Fuse the whole dynamics eval into ONE Pallas TPU kernel (only used on
    # explicitly-batched states, `q.ndim == 2`; flat ground only). 0 = off,
    # otherwise preferred env-tile size.
    pallas_tile: int = 0

    def replace(self, **kw) -> "EngineOptions":
        return dataclasses.replace(self, **kw)

    # ---------------- TOML/JSON round trip (reference `Simulator.{export,import}_options`)
    def to_dict(self) -> dict:
        def conv(obj):
            if dataclasses.is_dataclass(obj):
                return {f.name: conv(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
            if isinstance(obj, enum.Enum):
                return obj.value
            if callable(obj):
                return None
            return obj

        return conv(self)

    @classmethod
    def from_dict(cls, d: dict) -> "EngineOptions":
        contacts = d.get("contacts", {})
        if "model" in contacts:
            contacts = dict(contacts, model=ContactModel(contacts["model"]))
        stepper = d.get("stepper", {})
        if "integrator" in stepper:
            stepper = dict(stepper, integrator=IntegratorType(stepper["integrator"]))
        world = dict(d.get("world", {}))
        if "gravity" in world:
            world["gravity"] = tuple(world["gravity"])
        world.pop("ground_profile", None)
        top = {
            k: v
            for k, v in d.items()
            if k in ("controller_update_period", "sensor_update_period")
        }
        return cls(
            contacts=ContactOptions(**contacts),
            world=WorldOptions(**world),
            stepper=StepperOptions(**stepper),
            **top,
        )


# --------------------------------------------------------------------------- #
# Reference `*_options.toml` schema
# --------------------------------------------------------------------------- #

# Integrator names as the reference spells them (`engine.h` odeSolver strings)
_REF_SOLVERS = {
    "euler_explicit": IntegratorType.EULER_EXPLICIT,
    "runge_kutta_4": IntegratorType.RUNGE_KUTTA_4,
    "runge_kutta_dopri5": IntegratorType.RUNGE_KUTTA_DOPRI,
    "runge_kutta_dopri": IntegratorType.RUNGE_KUTTA_DOPRI,
}


def engine_options_from_reference_toml(path: str, base: "EngineOptions" = None
                                       ) -> "EngineOptions":
    """Translate a reference `*_options.toml` (the per-robot engine
    configuration files shipped next to each URDF, loaded by the reference's
    `BaseJiminyRobot`/`Simulator.import_options`, `jiminy_py/robot.py:518+`,
    `simulator.py:1030`) onto `EngineOptions`.

    Reference sections handled: `[engine.stepper]` (odeSolver, tolAbs/tolRel,
    dtMax, sensorsUpdatePeriod, controllerUpdatePeriod, iterMax via
    successiveIterFailedMax), `[engine.contacts]` (model, stiffness, damping,
    friction, torsion, stabilizationFreq, transitionEps, transitionVelocity),
    `[engine.constraints]` (regularization).  Unknown keys are ignored, like
    the reference ignores options for absent components.
    """
    import tomllib

    with open(path, "rb") as f:
        data = tomllib.load(f)
    eng = data.get("engine", data)
    base = base or EngineOptions()

    st = eng.get("stepper", {})
    stepper_kw = {}
    if "odeSolver" in st:
        stepper_kw["integrator"] = _REF_SOLVERS[st["odeSolver"]]
    for ref_key, key in (("tolAbs", "tol_abs"), ("tolRel", "tol_rel"),
                         ("dtMax", "dt_max"),
                         ("successiveIterFailedMax", "successive_iter_failed_max")):
        if ref_key in st:
            stepper_kw[key] = st[ref_key]
    cons = eng.get("constraints", {})
    if "regularization" in cons:
        stepper_kw["pgs_regularization"] = cons["regularization"]
    stepper = dataclasses.replace(base.stepper, **stepper_kw)

    ct = eng.get("contacts", {})
    contact_kw = {}
    if "model" in ct:
        contact_kw["model"] = ContactModel(ct["model"])
    for ref_key, key in (("stiffness", "stiffness"), ("damping", "damping"),
                         ("friction", "friction"), ("torsion", "torsion"),
                         ("stabilizationFreq", "stabilization_freq"),
                         ("transitionEps", "transition_eps"),
                         ("transitionVelocity", "transition_velocity")):
        if ref_key in ct:
            contact_kw[key] = ct[ref_key]
    contacts = dataclasses.replace(base.contacts, **contact_kw)

    top = {}
    if "sensorsUpdatePeriod" in st:
        top["sensor_update_period"] = st["sensorsUpdatePeriod"]
    if "controllerUpdatePeriod" in st:
        top["controller_update_period"] = st["controllerUpdatePeriod"]
    if contacts.model == ContactModel.CONSTRAINT:
        # Reference constraint mode also runs joint bounds through the solver
        top["joint_bounds_mode"] = "constraint"
    return dataclasses.replace(base, stepper=stepper, contacts=contacts, **top)
