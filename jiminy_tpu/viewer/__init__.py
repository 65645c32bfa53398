"""Viewer: offline 3D replay rendering of trajectories.

The reference ships Meshcat/Panda3d backends (`jiminy_py/viewer/`); neither is
available in a zero-egress TPU pod, so the default backend renders the robot
skeleton (joint tree + contact points + ground) with matplotlib 3D — good for
replay sanity checks, video export (GIF via pillow), and documentation stills.
The API mirrors `jiminy_py.viewer.Viewer` / `play_trajectories`.
"""

from jiminy_tpu.viewer.viewer import Viewer, play_trajectories

__all__ = ["Viewer", "play_trajectories"]
