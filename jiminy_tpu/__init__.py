"""jiminy_tpu: TPU-native robotics simulation and RL framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of `duburcqa/jiminy`:
minimal-coordinate rigid-body dynamics (ABA/RNEA/CRBA with motor armature), Lie-group
adaptive integration, spring-damper and constraint-based (PGS friction-cone) contact,
motor/sensor hardware models, a composable Gym pipeline, and multi-host PPO training —
all as pure functional transforms over pytrees, batched with `vmap` and sharded with
`shard_map` over TPU meshes.
"""

__version__ = "0.1.0"
