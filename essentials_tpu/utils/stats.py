"""Run statistics: MTEPS, workload, JSON export.

The reference declared this collector and never implemented it
(util::stats::log stub, /root/reference/include/gunrock/util/info.hxx:33-96);
it is implemented for real here since MTEPS is the benchmark metric
(BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import platform
import subprocess
from dataclasses import dataclass, field


def _git_sha() -> str:
    """Provenance parity with the reference's gitsha1 embed
    (/root/reference/CMakeLists.txt:133-136)."""
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True, cwd=None,
                              timeout=5).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


@dataclass
class RunStats:
    algorithm: str
    dataset: str
    n_vertices: int
    n_edges: int
    elapsed_ms: float
    iterations: int = 0
    edges_visited: int = 0           # total relaxations across supersteps
    vertices_visited: int = 0
    search_depth: int = 0
    mteps: float = 0.0               # millions of traversed edges per second
    redundance: float = 0.0          # edges_visited / n_edges
    backend: str = ""
    git_sha: str = field(default_factory=_git_sha)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def collect_stats(algorithm: str, dataset: str, graph, elapsed_ms: float,
                  iterations: int, edges_visited: int | None = None,
                  vertices_visited: int = 0) -> RunStats:
    import jax
    ev = int(edges_visited) if edges_visited is not None else graph.n_edges * max(iterations, 1)
    mteps = (ev / 1e6) / (elapsed_ms / 1e3) if elapsed_ms > 0 else 0.0
    return RunStats(
        algorithm=algorithm, dataset=dataset,
        n_vertices=graph.n_vertices, n_edges=graph.n_edges,
        elapsed_ms=elapsed_ms, iterations=iterations,
        edges_visited=ev, vertices_visited=int(vertices_visited),
        search_depth=iterations, mteps=mteps,
        redundance=ev / max(graph.n_edges, 1),
        backend=jax.default_backend(),
    )
