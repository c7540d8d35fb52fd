"""Build GUI draw-lists from a map state — the reference's DisplayPoses
(HitLSLAM_main.cpp:323-565) redone: trajectory lines, pose markers, world
frame scan points, and the pending correction sketch, appended to a DrawList
that the websocket bridge ships to the viewer.
"""

from __future__ import annotations

import numpy as np

from ..core.state import MapState
from .drawlist import (
    DrawList,
    POINT_COLOR,
    POSE_COLOR,
    TRAJECTORY_COLOR,
)


def display_poses(state: MapState, max_points: int | None = 200_000) -> DrawList:
    dl = DrawList()
    poses = np.asarray(state.poses)
    dl.draw_lines(poses[:-1, :2], poses[1:, :2], TRAJECTORY_COLOR)
    dl.draw_points(poses[:, :2], POSE_COLOR)

    world = np.asarray(state.world_points())
    mask = np.asarray(state.point_mask)
    pts = world[mask]
    if max_points is not None and len(pts) > max_points:
        idx = np.linspace(0, len(pts) - 1, max_points).astype(int)
        pts = pts[idx]
    dl.draw_points(pts, POINT_COLOR)

    if len(poses):
        dl.robot_pose = (float(poses[-1, 0]), float(poses[-1, 1]),
                         float(poses[-1, 2]))
    return dl


def display_selection(dl: DrawList, selected_points: list,
                      color: int = 0x2F36DE) -> DrawList:
    """Overlay the in-progress correction sketch (pairs of points as lines)."""
    pts = list(selected_points)
    for i in range(0, len(pts) - 1, 2):
        dl.draw_line(pts[i], pts[i + 1], color)
    for p in pts:
        dl.draw_circle(p, color)
    return dl
