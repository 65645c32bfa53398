"""Telemetry plotting: tabbed matplotlib figures of standard log groups
(reference `jiminy_py.plot.TabbedFigure` + `Simulator.plot`, `plot.py`)."""

from __future__ import annotations

import re
from typing import Dict, List, Optional

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
    """Minimal tabbed figure: one matplotlib figure per tab, switchable via
    `select(tab)`; in non-interactive use, `save_all(prefix)` exports PNGs."""

    def __init__(self, log: LogData, groups: Optional[Dict[str, List[str]]] = None):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        self.log = log
        self.groups = groups or group_variables(log)
        self.figures = {}
        t = log.time
        for tab, names in self.groups.items():
            fig, ax = plt.subplots(figsize=(10, 6))
            for name in sorted(names):
                ax.plot(t, log.variables[name], label=name.split(".", 1)[-1])
            ax.set_xlabel("time [s]")
            ax.set_title(tab)
            ax.grid(True)
            if len(names) <= 16:
                ax.legend(fontsize=7)
            self.figures[tab] = fig

    def select(self, tab: str):
        return self.figures[tab]

    def save_all(self, prefix: str) -> List[str]:
        paths = []
        for tab, fig in self.figures.items():
            path = f"{prefix}_{tab.replace(' ', '_').lower()}.png"
            fig.savefig(path, dpi=100, bbox_inches="tight")
            paths.append(path)
        return paths


def plot_log(log: LogData, save_prefix: Optional[str] = None) -> TabbedFigure:
    fig = TabbedFigure(log)
    if save_prefix:
        fig.save_all(save_prefix)
    return fig
