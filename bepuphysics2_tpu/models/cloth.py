"""Cloth lattice — the reference ClothDemo / ClothLatticeDemo equivalent
(Demos/Demos/ClothDemo.cs): a grid of small bodies linked by distance-style constraints
(center-distance springs plus diagonal shear links)."""
from __future__ import annotations

import numpy as np

from ..bodies import BodyDescription
from ..shapes import Sphere


def add_cloth(
    sim,
    origin=(0.0, 2.0, 0.0),
    width: int = 8,
    length: int = 8,
    spacing: float = 0.25,
    node_mass: float = 0.05,
    frequency: float = 25.0,
    pin_corners: bool = True,
    collidable: bool = False,
):
    """Builds a width×length cloth lattice. Returns the (width, length) handle grid."""
    node = Sphere(spacing * 0.3)
    node_shape = sim.add_shape(node) if collidable else -1
    ox, oy, oz = origin
    grid = np.zeros((width, length), np.int32)
    for i in range(width):
        for j in range(length):
            pinned = pin_corners and (i in (0, width - 1)) and j == 0
            pos = (ox + i * spacing, oy, oz + j * spacing)
            if pinned:
                grid[i, j] = sim.add_body(BodyDescription.kinematic(pos, node_shape))
            else:
                grid[i, j] = sim.add_body(
                    BodyDescription.dynamic(
                        pos, node_shape, node_mass, node, sleep_threshold=-1.0
                    )
                )

    def link(a, b, dist):
        sim.add_constraint(
            "center_distance", [int(a), int(b)],
            target_distance=float(dist), spring_frequency=frequency, spring_damping=1.0,
        )

    diag = spacing * np.sqrt(2.0)
    for i in range(width):
        for j in range(length):
            if i + 1 < width:
                link(grid[i, j], grid[i + 1, j], spacing)
            if j + 1 < length:
                link(grid[i, j], grid[i, j + 1], spacing)
            if i + 1 < width and j + 1 < length:
                link(grid[i, j], grid[i + 1, j + 1], diag)
                link(grid[i + 1, j], grid[i, j + 1], diag)
    return grid
