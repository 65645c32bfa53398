"""Utilities: random processes, procedural terrain, profiling, helpers."""

from jiminy_tpu.utils.profiling import Timer, timeit, trace
from jiminy_tpu.utils.random import PCG32, normal, uniform
from jiminy_tpu.utils.terrain import (
    PeriodicFourierProcess,
    PeriodicGaussianProcess,
    discretize_heightmap,
    merge_heightmaps,
    octave_perlin1,
    octave_perlin2,
    octave_perlin3,
    perlin1,
    perlin2,
    perlin3,
    periodic_perlin_ground,
    periodic_stairs_ground,
    random_perlin_ground,
    sum_heightmaps,
    unidirectional_random_perlin_ground,
)

__all__ = [
    "Timer",
    "timeit",
    "trace",
    "PCG32",
    "uniform",
    "normal",
    "PeriodicGaussianProcess",
    "PeriodicFourierProcess",
    "perlin1",
    "perlin2",
    "perlin3",
    "octave_perlin1",
    "octave_perlin2",
    "octave_perlin3",
    "periodic_stairs_ground",
    "random_perlin_ground",
    "periodic_perlin_ground",
    "unidirectional_random_perlin_ground",
    "sum_heightmaps",
    "merge_heightmaps",
    "discretize_heightmap",
]
