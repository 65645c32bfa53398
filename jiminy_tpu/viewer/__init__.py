"""Viewer: offline 3D replay rendering of trajectories.

The reference ships Meshcat/Panda3d backends (`jiminy_py/viewer/`); neither is
available in a zero-egress TPU pod, so two headless backends are provided:

- **glTF** (`export_gltf`): self-contained .glb animation of the full replay
  (per-joint keyframes, bone/contact geometry, ground heightmap) playable in
  any glTF 2.0 viewer — the TPU-pod equivalent of the reference's
  meshcat/panda3d `play_trajectories` video recording.
- **HTML** (`export_html`): single self-contained .html embedding the .glb
  plus a vanilla-JS WebGL player (orbit camera, play/pause/scrub/speed) — the
  browser-replay equivalent of the reference's meshcat backend, with no
  server, network, or external assets.
- **matplotlib** (`Viewer`, `play_trajectories`): skeleton stills and GIFs for
  sanity checks and documentation.
"""

from jiminy_tpu.viewer.gltf import GltfBuilder, export_gltf, load_glb
from jiminy_tpu.viewer.html import export_html
from jiminy_tpu.viewer.live import LiveViewer, LiveWrapper
from jiminy_tpu.viewer.viewer import Viewer, play_trajectories

__all__ = [
    "LiveViewer",
    "LiveWrapper",
    "Viewer",
    "play_trajectories",
    "export_gltf",
    "export_html",
    "load_glb",
    "GltfBuilder",
]
