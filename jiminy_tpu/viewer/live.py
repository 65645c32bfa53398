"""Live visualization of a running simulation.

Role of the reference's online viewing stack — `Viewer` with a live meshcat/
panda3d backend (`jiminy_py/viewer/viewer.py:436`) and
`play_trajectories(..., backend=...)` (`viewer/replay.py:1051`) — redesigned
for a headless TPU pod: the simulation host appends frames to a
`LiveViewer`, which periodically re-exports a trailing-window .glb and bumps
a JSON sequence file; a single self-contained HTML page (same WebGL player
as the offline replay, hot-swapping the scene via `window.__loadGlb`) polls
those two files over plain HTTP and follows the live edge.  No websocket
server, no ZMQ — the *protocol* is two files:

    live.json   {"seq": N, "t_end": float, "n_frames": int, "glb": "live.glb"}
    live.glb    trailing-window replay animation (regenerated atomically)

Serve the session directory with any static file server (`LiveViewer.serve()`
starts one) and open `live.html`.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Optional

import numpy as np


class LiveViewer:
    """Stream simulation states to a browser while the simulation runs.

    Usage::

        live = LiveViewer(robot, "session_dir", window=10.0)
        url = live.serve()          # http://127.0.0.1:PORT/live.html
        for _ in range(n):
            state = step(...)
            live.push(float(state.sim.t), np.asarray(state.sim.q))
        live.close()

    `push` buffers frames on the host; every `refresh_every` pushed frames
    (or on explicit `flush()`) the trailing `window` seconds are re-exported
    as `live.glb` and `live.json.seq` is bumped — the page reloads the scene
    and keeps following the newest timestamp.  For in-jit rollouts, wrap the
    env with `jiminy_tpu.viewer.live.LiveWrapper` instead: it taps (t, q) out
    of the jitted step through `jax.experimental.io_callback` (the same
    host-bridge the engine uses for Python controllers).
    """

    def __init__(
        self,
        robot,
        directory: str,
        window: float = 10.0,
        fps: float = 25.0,
        refresh_every: int = 25,
        poll_ms: int = 500,
        **gltf_kwargs: Any,
    ):
        self.robot = robot
        self.directory = directory
        self.window = float(window)
        self.fps = float(fps)
        self.refresh_every = int(refresh_every)
        self.gltf_kwargs = gltf_kwargs
        self._times: list = []
        self._qs: list = []
        self._seq = 0
        self._pushes_since_flush = 0
        self._server = None
        os.makedirs(directory, exist_ok=True)
        self.html_path = self._write_html(poll_ms)
        self.flush()  # initial (neutral-pose) scene so the page always loads

    # -- producer side ----------------------------------------------------- #
    def push(self, t: float, q: np.ndarray) -> None:
        """Append one frame (host values); auto-flush every `refresh_every`."""
        self._times.append(float(t))
        self._qs.append(np.asarray(q, np.float64).copy())
        self._pushes_since_flush += 1
        if self._pushes_since_flush >= self.refresh_every:
            self.flush()

    def flush(self) -> int:
        """Re-export the trailing window and publish a new sequence number."""
        from jiminy_tpu.telemetry.trajectory import Trajectory
        from jiminy_tpu.viewer.gltf import export_gltf

        if self._times:
            times = np.asarray(self._times)
            qs_all = np.asarray(self._qs)
            # Defensive time ordering (an unordered producer must not corrupt
            # the exported animation)
            order = np.argsort(times, kind="stable")
            times, qs_all = times[order], qs_all[order]
            keep = times >= times[-1] - self.window
            times, qs = times[keep], qs_all[keep]
            # Drop frames older than the window from the buffer too
            self._times = list(times)
            self._qs = list(qs)
        else:
            # Neutral standing pose placeholder before the first push
            times = np.zeros(1)
            qs = np.asarray(self.robot.model.neutral(), np.float64)[None]
        traj = Trajectory(times=times, qs=qs, robot=self.robot)
        tmp = os.path.join(self.directory, ".live.glb.tmp")
        export_gltf(traj, tmp, fps=self.fps, **self.gltf_kwargs)
        os.replace(tmp, os.path.join(self.directory, "live.glb"))
        self._seq += 1
        meta = {
            "seq": self._seq,
            "t_end": float(times[-1]),
            "n_frames": int(len(times)),
            "glb": "live.glb",
        }
        tmp = os.path.join(self.directory, ".live.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.directory, "live.json"))
        self._pushes_since_flush = 0
        return self._seq

    # -- consumer side ----------------------------------------------------- #
    def _write_html(self, poll_ms: int) -> str:
        from jiminy_tpu.viewer.html import _HTML_TMPL, _PLAYER_JS

        poll_js = _LIVE_POLL_JS.replace("__POLL_MS__", str(int(poll_ms)))
        html = _HTML_TMPL.format(
            title="jiminy_tpu live",
            player_js=_PLAYER_JS + poll_js,
            glb_b64=_EMPTY_GLB_B64,
        ).replace(
            '<span id="tlabel"></span>',
            '<span id="live" style="color:#7CFC00;min-width:70px">'
            "live: connecting</span><span id=\"tlabel\"></span>",
        )
        path = os.path.join(self.directory, "live.html")
        with open(path, "w") as f:
            f.write(html)
        return path

    def serve(self, port: int = 0) -> str:
        """Start a static file server for the session directory in a daemon
        thread; returns the URL of the live page."""
        import functools
        import http.server
        import socketserver

        class _QuietHandler(http.server.SimpleHTTPRequestHandler):
            def log_message(self, *args):  # no per-request stderr spam
                pass

        handler = functools.partial(_QuietHandler, directory=self.directory)
        socketserver.TCPServer.allow_reuse_address = True
        httpd = socketserver.TCPServer(("127.0.0.1", port), handler)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        self._server = httpd
        return f"http://127.0.0.1:{httpd.server_address[1]}/live.html"

    def close(self) -> None:
        if self._times:
            self.flush()
        if self._server is not None:
            self._server.shutdown()
            self._server = None


class LiveWrapper:
    """Env wrapper that streams every Nth step's (t, q) to a `LiveViewer`
    from *inside* jitted code via `jax.experimental.io_callback` — the live
    equivalent of the engine's host-controller bridge (`engine/callback.py`).

    The callback is ordered and cheap (two small host arrays per tap); use
    `every > 1` to thin the stream when stepping fast.

    .. note::
        Live viewing follows ONE simulation: wrap a single (unbatched) env.
        Ordered io_callbacks cannot be vmapped, so this wrapper intentionally
        sits outside the batch-transparency convention — for batched
        training, watch a separate single-env evaluation rollout instead
        (mirroring the reference, whose live Viewer also attaches to one
        simulation at a time, `viewer/viewer.py:436`).
    """

    def __init__(self, env, live: LiveViewer, every: int = 1):
        self.env = env
        self.live = live
        self.every = int(every)
        self._count = 0

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _tap(self, t, q):
        self._count += 1
        if self._count % self.every == 0:
            self.live.push(float(t), np.asarray(q))
        return np.int32(0)

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action):
        import jax
        import jax.numpy as jnp
        from jax.experimental import io_callback

        out = self.env.step(state, action)
        state = out[0]
        token = io_callback(
            self._tap,
            jax.ShapeDtypeStruct((), jnp.int32),
            state.sim.t,
            state.sim.q,
            ordered=True,
        )
        # Tie the callback into the returned state so XLA cannot elide it
        state = state.replace(
            sim=state.sim.replace(t=state.sim.t + 0.0 * token.astype(state.sim.t.dtype))
        )
        return (state,) + out[1:]


_LIVE_POLL_JS = r"""
window.__liveFollow=true;
(function(){
 let seq=-1;const el=function(){return document.getElementById('live');};
 async function tick(){
  try{
   const meta=await (await fetch('live.json?_='+Date.now())).json();
   if(meta.seq!==seq){
    seq=meta.seq;
    const buf=await (await fetch(meta.glb+'?_='+seq)).arrayBuffer();
    window.__loadGlb(buf,true);
    el().textContent='LIVE #'+seq+' ('+meta.n_frames+'f)';
   }
  }catch(e){el().textContent='live: waiting';}
  setTimeout(tick,__POLL_MS__);
 }
 tick();
})();
"""

# Minimal valid glb (empty scene) so the live page renders before first poll:
# generated once from GltfBuilder with no nodes.
_EMPTY_GLB_B64 = (
    "Z2xURgIAAABYAAAARAAAAEpTT057ImFzc2V0IjogeyJ2ZXJzaW9uIjogIjIuMCJ9LCAic2Nl"
    "bmUiOiAwLCAic2NlbmVzIjogW3sibm9kZXMiOiBbXX1dfQ=="
)
