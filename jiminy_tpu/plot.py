"""Telemetry plotting: a button-tabbed matplotlib figure of time series
(reference `jiminy_py.plot.TabbedFigure` + `Simulator.plot`, `plot.py:162-640`).

One matplotlib window holds every tab; a row of buttons along the bottom
switches between them (clickable under any interactive backend — TkAgg, Qt,
nbAgg); under a headless `Agg` backend the same object still works fully
offscreen via `save_tab`/`save_all`.  Each tab lays its variables out on a
near-square grid of subplots sharing the time axis, like the reference."""

from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Optional

import numpy as np

from jiminy_tpu.telemetry.recorder import LogData


def group_variables(log: LogData) -> Dict[str, List[str]]:
    """Group log columns into the reference's standard tabs: positions,
    velocities, efforts, contact forces, per-sensor-type groups."""
    groups: Dict[str, List[str]] = {}
    for name in log.variables:
        if name == "Global.Time":
            continue
        if "currentPositionQ" in name:
            groups.setdefault("State Positions", []).append(name)
        elif "currentVelocityV" in name:
            groups.setdefault("State Velocities", []).append(name)
        elif "currentAcceleration" in name:
            groups.setdefault("State Accelerations", []).append(name)
        elif "currentEffort" in name:
            groups.setdefault("Motor Efforts", []).append(name)
        elif ".contact" in name:
            groups.setdefault("Contact Forces", []).append(name)
        else:
            m = re.match(r"[^.]+\.([^.]+)\.", name)
            groups.setdefault(m.group(1) if m else "Misc", []).append(name)
    return groups


class TabbedFigure:
    """Single-window tabbed time-series figure (reference `TabbedFigure`,
    `jiminy_py/plot.py:162`).

    Two construction styles:

    - reference style — start empty, then `add_tab(name, time, data)` where
      `data` maps curve names to 1-D arrays (one subplot per curve, shared
      time axis); switch with the bottom button row or `select_tab`.
    - log style (round-3 compatible) — `TabbedFigure(log)` builds the
      standard telemetry tabs of `group_variables` at once.

    `refresh_data` updates a tab's curves in place (live plotting);
    `save_tab`/`save_all` export PNGs regardless of backend.
    """

    _BTN_H = 0.07  # figure fraction reserved for the tab-button row

    def __init__(
        self,
        log: Optional[LogData] = None,
        groups: Optional[Dict[str, List[str]]] = None,
        sync_tabs: bool = False,
        window_title: str = "jiminy_tpu",
        offscreen: bool = False,
    ):
        import matplotlib

        if offscreen:
            matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        self._plt = plt
        self.sync_tabs = sync_tabs
        self.figure = plt.figure(figsize=(11, 7))
        try:
            self.figure.canvas.manager.set_window_title(window_title)
        except Exception:
            pass
        self._tabs: Dict[str, Dict[str, Any]] = {}
        self._buttons: Dict[str, Any] = {}
        self._button_axes: Dict[str, Any] = {}
        self.active_tab: Optional[str] = None

        if log is not None:
            t = np.asarray(log.time)
            for tab, names in (groups or group_variables(log)).items():
                self.add_tab(
                    tab,
                    t,
                    {n.split(".", 1)[-1]: np.asarray(log.variables[n])
                     for n in sorted(names)},
                )

    # ------------------------------------------------------------------ #
    def add_tab(
        self,
        name: str,
        time: np.ndarray,
        data: Dict[str, np.ndarray],
        *,
        nrows: Optional[int] = None,
        ncols: Optional[int] = None,
    ) -> None:
        """Add a tab plotting each `data` entry on its own subplot
        (reference `TabbedFigure.add_tab`, `plot.py:300`)."""
        if name in self._tabs:
            raise ValueError(f"duplicate tab {name!r}")
        n = max(len(data), 1)
        auto_grid = nrows is None and ncols is None
        if ncols is None:
            ncols = math.ceil(math.sqrt(n))
        if nrows is None:
            nrows = math.ceil(n / ncols)
        self._tabs[name] = {
            "time": np.asarray(time),
            "data": {k: np.asarray(v) for k, v in data.items()},
            "grid": (nrows, ncols),
            "auto_grid": auto_grid,
            "n_curves": n,
            "xlim": None,
        }
        self._rebuild_buttons()
        if self.active_tab is None:
            self.select_tab(name)

    def remove_tab(self, name: str) -> None:
        """Drop a tab (reference `TabbedFigure.remove_tab`, `plot.py:556`)."""
        del self._tabs[name]
        self._rebuild_buttons()
        if self.active_tab == name:
            self.active_tab = None
            if self._tabs:
                self.select_tab(next(iter(self._tabs)))
            else:
                for ax in list(self.figure.axes):
                    if ax not in self._button_axes.values():
                        ax.remove()

    def refresh_data(
        self, name: str, time: np.ndarray, data: Dict[str, np.ndarray]
    ) -> None:
        """Replace a tab's series and redraw it if active (reference
        `refresh_data`, `plot.py:520` — live plotting)."""
        tab = self._tabs[name]
        tab["time"] = np.asarray(time)
        tab["data"] = {k: np.asarray(v) for k, v in data.items()}
        # Re-fit an auto-computed subplot grid when the curve count changed
        n = max(len(tab["data"]), 1)
        if tab.get("auto_grid", True) and n != tab.get("n_curves", n):
            ncols = math.ceil(math.sqrt(n))
            tab["grid"] = (math.ceil(n / ncols), ncols)
        tab["n_curves"] = n
        if self.active_tab == name:
            self._draw_tab(name)

    # ------------------------------------------------------------------ #
    def select_tab(self, name: str) -> None:
        """Switch the window to the given tab."""
        if name not in self._tabs:
            raise KeyError(name)
        if self.sync_tabs and self.active_tab is not None:
            prev = self._tabs[self.active_tab]
            axes = self._content_axes()
            if axes:
                prev["xlim"] = axes[0].get_xlim()
                self._tabs[name]["xlim"] = prev["xlim"]
        self.active_tab = name
        self._draw_tab(name)

    # Round-3 compatible alias (returned the per-tab figure then; the tabbed
    # window is shared now, so the single figure is returned instead).
    def select(self, name: str):
        self.select_tab(name)
        return self.figure

    @property
    def tabs(self) -> List[str]:
        return list(self._tabs)

    @property
    def figures(self) -> Dict[str, Any]:
        """Round-3 compatible view: tab name -> figure.  All tabs share the
        one tabbed window now, so every entry is the same figure object."""
        return {name: self.figure for name in self._tabs}

    # ------------------------------------------------------------------ #
    def _content_axes(self):
        return [ax for ax in self.figure.axes
                if ax not in self._button_axes.values()]

    def _draw_tab(self, name: str) -> None:
        for ax in self._content_axes():
            ax.remove()
        tab = self._tabs[name]
        nrows, ncols = tab["grid"]
        t = tab["time"]
        gs = self.figure.add_gridspec(
            nrows, ncols, bottom=self._BTN_H + 0.08, top=0.94,
            hspace=0.45, wspace=0.3,
        )
        shared = None
        for i, (label, series) in enumerate(tab["data"].items()):
            ax = self.figure.add_subplot(
                gs[i // ncols, i % ncols], sharex=shared
            )
            shared = shared or ax
            ax.plot(t, series)
            ax.set_title(label, fontsize=8)
            ax.grid(True)
            ax.tick_params(labelsize=7)
            if tab["xlim"] is not None:
                ax.set_xlim(tab["xlim"])
        self.figure.suptitle(name)
        for bname, btn in self._buttons.items():
            btn.label.set_fontweight(
                "bold" if bname == name else "normal"
            )
        self.figure.canvas.draw_idle()

    def _rebuild_buttons(self) -> None:
        from matplotlib.widgets import Button

        for ax in self._button_axes.values():
            ax.remove()
        self._buttons.clear()
        self._button_axes.clear()
        names = list(self._tabs)
        if not names:
            return
        w = min(0.95 / len(names), 0.2)
        for i, name in enumerate(names):
            bax = self.figure.add_axes(
                [0.025 + i * w, 0.01, w * 0.94, self._BTN_H - 0.02]
            )
            btn = Button(bax, name)
            btn.label.set_fontsize(7)
            btn.on_clicked(
                lambda _event, n=name: self.select_tab(n)
            )
            self._buttons[name] = btn
            self._button_axes[name] = bax

    # ------------------------------------------------------------------ #
    def save_tab(self, path: str, name: Optional[str] = None) -> str:
        """Export one tab as PNG (reference `save_tab`, `plot.py:600`)."""
        if name is not None and name != self.active_tab:
            self.select_tab(name)
        self.figure.savefig(path, dpi=100)
        return path

    def save_all(self, prefix: str) -> List[str]:
        paths = []
        for tab in self._tabs:
            path = f"{prefix}_{tab.replace(' ', '_').lower()}.png"
            paths.append(self.save_tab(path, tab))
        return paths

    def close(self) -> None:
        self._plt.close(self.figure)


def plot_log(log: LogData, save_prefix: Optional[str] = None) -> TabbedFigure:
    fig = TabbedFigure(log)
    if save_prefix:
        fig.save_all(save_prefix)
    return fig


def plot_log_interactive(log: LogData, **kwargs) -> TabbedFigure:
    """Open the standard telemetry tabs in the interactive tabbed window
    (reference `plot.py plot_log_interactive`); under a headless backend this
    is equivalent to `plot_log` without the PNG export."""
    return TabbedFigure(log, **kwargs)
