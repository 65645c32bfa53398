"""Preconfigured environments (reference `gym_jiminy.envs` registration,
`python/gym_jiminy/envs/gym_jiminy/envs/__init__.py:31-100`).

`make(env_id)` mirrors Gym registration; every env also remains a plain class
usable functionally (reset/step pure functions) for vmap/shard_map rollouts.
"""

from jiminy_tpu.envs.toys import AcrobotEnv, CartPoleEnv, PendulumEnv
from jiminy_tpu.envs.ant import AntEnv
from jiminy_tpu.envs.anymal import ANYmalEnv, ANYmalPDControlEnv
from jiminy_tpu.envs.locomotion import WalkerEnv
from jiminy_tpu.envs.bipeds import (
    AtlasEnv,
    AtlasPDControlEnv,
    AtlasReducedEnv,
    AtlasReducedPDControlEnv,
    CassieEnv,
    CassiePDControlEnv,
    DigitEnv,
    DigitPDControlEnv,
)

_REGISTRY = {
    "cartpole": CartPoleEnv,
    "acrobot": AcrobotEnv,
    "pendulum": PendulumEnv,
    "ant": AntEnv,
    "anymal": ANYmalEnv,
    "anymal-pid": ANYmalPDControlEnv,
    "cassie": CassieEnv,
    "cassie-pid": CassiePDControlEnv,
    "digit": DigitEnv,
    "digit-pid": DigitPDControlEnv,
    "atlas": AtlasEnv,
    "atlas-reduced": AtlasReducedEnv,
    "atlas-pid": AtlasPDControlEnv,
    "atlas-reduced-pid": AtlasReducedPDControlEnv,
}


# Reference class names (migration aliases)
WalkerJiminyEnv = WalkerEnv
CartPoleJiminyEnv = CartPoleEnv
AcrobotJiminyEnv = AcrobotEnv
AntJiminyEnv = AntEnv
ANYmalJiminyEnv = ANYmalEnv
CassieJiminyEnv = CassieEnv
DigitJiminyEnv = DigitEnv
AtlasJiminyEnv = AtlasEnv
AtlasReducedJiminyEnv = AtlasReducedEnv


def register(name, ctor):
    _REGISTRY[name] = ctor


def make(name: str, **kwargs):
    try:
        ctor = _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown env '{name}'; available: {sorted(_REGISTRY)}") from None
    return ctor(**kwargs)


__all__ = [
    "WalkerEnv",
    "WalkerJiminyEnv",
    "CartPoleJiminyEnv",
    "AcrobotJiminyEnv",
    "AntJiminyEnv",
    "ANYmalJiminyEnv",
    "CassieJiminyEnv",
    "DigitJiminyEnv",
    "AtlasJiminyEnv",
    "AtlasReducedJiminyEnv",
    "CartPoleEnv",
    "AcrobotEnv",
    "PendulumEnv",
    "AntEnv",
    "ANYmalEnv",
    "ANYmalPDControlEnv",
    "make",
    "register",
]
