"""Matplotlib skeleton viewer + trajectory replay
(reference `jiminy_py/viewer/viewer.py:436`, `replay.py play_trajectories`)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from jiminy_tpu.ops.kinematics import forward_kinematics, frame_placement


class Viewer:
    """Render a robot configuration as a 3D skeleton."""

    def __init__(self, robot, backend: str = "matplotlib"):
        if backend != "matplotlib":
            raise ValueError(
                "only the 'matplotlib' backend is available in this build "
                "(meshcat/panda3d need a display/network)"
            )
        import matplotlib

        matplotlib.use("Agg", force=False)
        self.robot = robot

    # ------------------------------------------------------------------ #
    def _skeleton(self, q):
        model = self.robot.model
        kin = forward_kinematics(model, jnp.asarray(q))
        pts = np.asarray(kin.omi.pos)
        segments = []
        for i in range(model.njoints):
            p = model.parents[i]
            if p >= 0:
                segments.append((pts[p], pts[i]))
        contacts = []
        for fidx in self.robot.contact_frame_indices:
            contacts.append(np.asarray(frame_placement(model, kin, fidx).pos))
        return pts, segments, np.array(contacts) if contacts else np.zeros((0, 3))

    def render(self, q, ax=None, ground_fn=None):
        """Draw one configuration; returns the matplotlib Axes3D."""
        import matplotlib.pyplot as plt

        if ax is None:
            fig = plt.figure(figsize=(7, 7))
            ax = fig.add_subplot(111, projection="3d")
        pts, segments, contacts = self._skeleton(q)
        for a, b in segments:
            ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], "o-", color="C0", lw=2,
                    markersize=3)
        if len(contacts):
            ax.scatter(contacts[:, 0], contacts[:, 1], contacts[:, 2], color="C3", s=25)
        # Ground patch
        lim = max(1.0, np.abs(pts).max() + 0.3)
        xs = np.linspace(-lim, lim, 12)
        gx, gy = np.meshgrid(xs, xs)
        if ground_fn is not None:
            h, _ = ground_fn(jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1)))
            gz = np.asarray(h).reshape(gx.shape)
        else:
            gz = np.zeros_like(gx)
        ax.plot_surface(gx, gy, gz, alpha=0.15, color="gray")
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_zlim(-0.1, max(1.5, pts[:, 2].max() + 0.3))
        ax.set_box_aspect((1, 1, 0.7))
        return ax

    def save_frame(self, q, path: str, ground_fn=None) -> str:
        import matplotlib.pyplot as plt

        ax = self.render(q, ground_fn=ground_fn)
        ax.figure.savefig(path, dpi=90, bbox_inches="tight")
        plt.close(ax.figure)
        return path


def play_trajectories(
    trajectories: Sequence,
    robots: Optional[Sequence] = None,
    output_path: Optional[str] = None,
    fps: float = 25.0,
    ground_fn=None,
):
    """Replay trajectories to an animated GIF (reference `play_trajectories`,
    `jiminy_py/viewer/replay.py`).  `trajectories` are
    `jiminy_tpu.telemetry.Trajectory` objects (robot attached or given)."""
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    trajs = list(trajectories)
    robots = robots or [t.robot for t in trajs]
    viewers = [Viewer(r) for r in robots]
    duration = max(t.duration for t in trajs)
    times = np.arange(0.0, duration, 1.0 / fps)

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(111, projection="3d")

    def draw(k):
        ax.cla()
        for traj, viewer in zip(trajs, viewers):
            s = traj.state_at(times[k])
            viewer.render(s.q, ax=ax, ground_fn=ground_fn)
        ax.set_title(f"t = {times[k]:.2f}s")
        return []

    anim = FuncAnimation(fig, draw, frames=len(times), blit=False)
    if output_path:
        anim.save(output_path, writer=PillowWriter(fps=int(fps)))
        plt.close(fig)
        return output_path
    return anim
