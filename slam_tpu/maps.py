"""Map I/O: landmark + waypoint maps.

Reads the reference's text ``.mat`` format (src/backend/core.cpp:855-962):

    # comment
    lm <rows> <cols>
    <cols lines of rows floats>     # one landmark per LINE (column-major file)
    wp <rows> <cols>
    <cols lines of rows floats>

In the reference, data is stored transposed (a 2xN Eigen matrix filled one
column per file line). Here maps are plain row-major numpy arrays:
``landmarks [N, 2]`` and ``waypoints [W, 2]``.

Also provides ``synthetic_map`` for the large-scale benchmark configs
(10k-landmark map, BASELINE.json config #5) which has no reference
counterpart.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class SlamMap:
    landmarks: np.ndarray  # [N, 2] float32
    waypoints: np.ndarray  # [W, 2] float32

    @property
    def n_landmarks(self) -> int:
        return int(self.landmarks.shape[0])

    @property
    def n_waypoints(self) -> int:
        return int(self.waypoints.shape[0])

    def extent(self):
        """(xmin, xmax, ymin, ymax) over landmarks+waypoints, padded 5%
        (reference plot range logic, slamwrapper.cpp:141-172)."""
        pts = np.concatenate([self.landmarks, self.waypoints], axis=0)
        xmin, ymin = pts.min(axis=0)
        xmax, ymax = pts.max(axis=0)
        dx, dy = xmax - xmin, ymax - ymin
        return (xmin - 0.05 * dx, xmax + 0.05 * dx,
                ymin - 0.05 * dy, ymax + 0.05 * dy)


def read_map_file(path: str) -> SlamMap:
    """Parse a reference-format map file into a SlamMap.

    Mirrors readInputFile behavior (core.cpp:855-962): ``#`` comment lines
    and blank lines skipped; ``lm``/``wp`` headers give (rows, cols); the
    following ``cols`` non-blank lines each carry ``rows`` floats.
    """
    landmarks = None
    waypoints = None
    with open(path, "r") as fh:
        lines = [ln.strip() for ln in fh]
    # Iterate with an explicit cursor so section bodies can consume lines.
    i = 0

    def next_data_line():
        nonlocal i
        while i < len(lines):
            ln = lines[i]
            i += 1
            if not ln or ln.startswith("#"):
                continue
            return ln
        raise ValueError(f"{path}: unexpected EOF inside section")

    while True:
        # find next header
        header = None
        while i < len(lines):
            ln = lines[i]
            i += 1
            if not ln or ln.startswith("#"):
                continue
            header = ln
            break
        if header is None:
            break
        tokens = header.split()
        if tokens[0] not in ("lm", "wp") or len(tokens) != 3:
            raise ValueError(f"{path}: bad section header: {header!r}")
        rows, cols = int(float(tokens[1])), int(float(tokens[2]))
        data = np.empty((cols, rows), dtype=np.float32)
        for c in range(cols):
            vals = next_data_line().split()
            if len(vals) < rows:
                raise ValueError(f"{path}: short data line in {tokens[0]}")
            data[c] = [float(v) for v in vals[:rows]]
        if tokens[0] == "lm":
            landmarks = data
        else:
            waypoints = data

    if landmarks is None or waypoints is None:
        raise ValueError(f"{path}: missing lm or wp section")
    return SlamMap(landmarks=landmarks, waypoints=waypoints)


def write_map_file(path: str, slam_map: SlamMap) -> None:
    """Write a SlamMap in the reference text format (round-trips with
    read_map_file; used by tests and synthetic-map generation)."""
    with open(path, "w") as fh:
        fh.write("#type columns rows\n")
        fh.write(f"lm 2 {slam_map.n_landmarks}\n")
        for x, y in slam_map.landmarks:
            fh.write(f"{x:.6f} {y:.6f}\n")
        fh.write(f"\nwp 2 {slam_map.n_waypoints}\n")
        for x, y in slam_map.waypoints:
            fh.write(f"{x:.6f} {y:.6f}\n")


def synthetic_map(n_landmarks: int, n_waypoints: int = 32,
                  radius: float = 200.0, seed: int = 0) -> SlamMap:
    """Generate a large synthetic map: waypoints on a loop, landmarks
    scattered around the loop corridor. Supports the 10k-landmark
    multi-chip benchmark config (BASELINE.json config #5)."""
    rng = np.random.default_rng(seed)
    theta = np.linspace(0.0, 2 * np.pi, n_waypoints, endpoint=False)
    # wobbly loop so steering stays non-trivial
    r_wp = radius * (1.0 + 0.15 * np.sin(3 * theta))
    waypoints = np.stack([r_wp * np.cos(theta), r_wp * np.sin(theta)],
                         axis=1).astype(np.float32)
    # landmarks in an annulus around the loop
    ang = rng.uniform(0.0, 2 * np.pi, n_landmarks)
    rad = radius * (1.0 + rng.uniform(-0.4, 0.4, n_landmarks))
    landmarks = np.stack([rad * np.cos(ang), rad * np.sin(ang)],
                         axis=1).astype(np.float32)
    return SlamMap(landmarks=landmarks, waypoints=waypoints)
