"""QPU layout design: coupling graphs, snake paths, annotated renderings.

Capability parity with C24 (brisbane/torino/garnet layout scripts, SURVEY.md
§2b): the reference hand-crafts snake-shaped linear embeddings of the spin
chain onto device topologies and renders annotated coupling maps. Here the
snake is FOUND automatically (backtracking longest-path search with a
degree heuristic) over generated coupling graphs, and the renderer colors
edges by adjacency-in-chain vs physical-only, with chain position on a
viridis flow — same diagnostic content, no hand-maintained index lists.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# coupling graphs


def linear_with_ancilla_coupling(L: int, probe_qubit: int | None = None):
    """The simulator coupling map: chain 1..L + ancilla 0 attached at the
    probe site (autocorr-delta-a-single-qiskit-fast.py:159)."""
    q = (L // 2) if probe_qubit is None else probe_qubit
    edges = [(i, i + 1) for i in range(1, L)]
    edges.append((0, q + 1))
    return L + 1, edges


def heavy_hex_coupling(long_rows: int = 7, width: int = 15):
    """Heavy-hex lattice in the IBM Eagle arrangement.

    `long_rows` rows of `width` qubits (first and last rows are width-1),
    bridged by 4-qubit connector rows. Defaults give the 127-qubit
    Brisbane/Eagle graph; heavy_hex_coupling(7, 16) gives a 133-qubit
    Heron-class (Torino-scale) graph.
    """
    rows = []
    idx = 0
    coords = {}
    for r in range(long_rows):
        w = width - 1 if r in (0, long_rows - 1) else width
        x0 = 1 if r == 0 else 0
        row = []
        for c in range(w):
            coords[idx] = (x0 + c, 2 * r)
            row.append(idx)
            idx += 1
        rows.append(row)
        if r < long_rows - 1:
            # connector row: 4 qubits at alternating column phase
            cols = range(0, width, 4) if r % 2 == 1 else range(2, width, 4)
            bridge = []
            for c in cols:
                coords[idx] = (c, 2 * r + 1)
                bridge.append((idx, c))
                idx += 1
            rows.append(bridge)

    n = idx
    edges = []
    for r in range(0, len(rows), 2):
        row = rows[r]
        for a, b in zip(row, row[1:]):
            edges.append((a, b))
    for r in range(1, len(rows), 2):
        above = rows[r - 1]
        below = rows[r + 1]
        above_cols = {coords[q][0]: q for q in above}
        below_cols = {coords[q][0]: q for q in below}
        for q, c in rows[r]:
            if c in above_cols:
                edges.append((above_cols[c], q))
            if c in below_cols:
                edges.append((q, below_cols[c]))
    return n, edges, coords


def garnet_coupling():
    """IQM Garnet-style 20-qubit square-lattice 'crystal' (diamond shape)."""
    # diamond rows of widths 2,4,4,4,4,2 on a rotated square grid
    rows = [2, 3, 4, 4, 4, 3]
    coords = {}
    idx = 0
    grid = {}
    layout = [
        (0, [1, 2]),
        (1, [0, 1, 2]),
        (2, [0, 1, 2, 3]),
        (3, [0, 1, 2, 3]),
        (4, [0, 1, 2, 3]),
        (5, [1, 2, 3]),
    ]
    for r, cols in layout:
        for c in cols:
            coords[idx] = (c + (0.5 if r % 2 else 0.0), r)
            grid[(r, c)] = idx
            idx += 1
    n = idx
    edges = []
    for (r, c), q in grid.items():
        # rotated-square neighbors: (r+1, c) and (r+1, c +/- 1) depending on parity
        for dc in (0, 1) if r % 2 else (-1, 0):
            if (r + 1, c + dc) in grid:
                edges.append((q, grid[(r + 1, c + dc)]))
    return n, edges, coords


# ---------------------------------------------------------------------------
# snake path search


def find_snake_path(n: int, edges, length: int, start: int | None = None,
                    max_steps: int = 2_000_000):
    """Longest-path (backtracking DFS, fewest-free-neighbors-first heuristic)
    covering `length` nodes; returns the node sequence or None."""
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    starts = [start] if start is not None else sorted(
        range(n), key=lambda v: len(adj[v]))
    steps = 0

    def dfs(path, used):
        nonlocal steps
        steps += 1
        if steps > max_steps:
            return None
        if len(path) == length:
            return list(path)
        cand = sorted(
            (v for v in adj[path[-1]] if v not in used),
            key=lambda v: len(adj[v] - used),
        )
        for v in cand:
            path.append(v)
            used.add(v)
            r = dfs(path, used)
            if r is not None:
                return r
            path.pop()
            used.remove(v)
        return None

    for s in starts:
        r = dfs([s], {s})
        if r is not None:
            return r
    return None


def snake_layout(cfg_or_L, device: str = "brisbane", with_ancilla: bool = True):
    """Map a length-L chain (+ ancilla at the probe site) onto a device.

    Returns dict: {"path": chain snake nodes, "ancilla": physical node or
    None, "n": device size, "edges": coupling list, "coords": positions}.
    """
    L = getattr(cfg_or_L, "L", cfg_or_L)
    if device == "brisbane":
        n, edges, coords = heavy_hex_coupling(7, 15)
    elif device == "torino":
        n, edges, coords = heavy_hex_coupling(7, 16)
    elif device == "garnet":
        n, edges, coords = garnet_coupling()
    elif device == "linear":
        n, edges = linear_with_ancilla_coupling(L)
        coords = {i: (i, (i * i) / 10.0) for i in range(n)}
        return {"path": list(range(1, L + 1)), "ancilla": 0, "n": n,
                "edges": edges, "coords": coords}
    else:
        raise ValueError(f"unknown device {device!r}")

    path = find_snake_path(n, edges, L)
    if path is None:
        raise ValueError(f"no length-{L} snake on {device} ({n} qubits)")
    anc = None
    if with_ancilla:
        adj = {i: set() for i in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        probe = path[L // 2]
        free = adj[probe] - set(path)
        anc = min(free) if free else None
    return {"path": path, "ancilla": anc, "n": n, "edges": edges,
            "coords": coords}


def render_layout(layout: dict, out_png: str, title: str = ""):
    """Annotated topology rendering: chain position on viridis, chain edges
    vs physical-only edges, purple dashed arcs for non-physical snake hops."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    coords = layout["coords"]
    path = layout["path"]
    pos_in_chain = {q: i for i, q in enumerate(path)}
    fig, ax = plt.subplots(figsize=(10, 7))
    chain_edges = {frozenset(e) for e in zip(path, path[1:])}
    for a, b in layout["edges"]:
        xa, ya = coords[a]
        xb, yb = coords[b]
        in_chain = frozenset((a, b)) in chain_edges
        ax.plot([xa, xb], [ya, yb],
                color="tab:orange" if in_chain else "lightgray",
                lw=2.5 if in_chain else 1.0, zorder=1)
    for a, b in zip(path, path[1:]):
        if frozenset((a, b)) not in {frozenset(e) for e in layout["edges"]}:
            xa, ya = coords[a]
            xb, yb = coords[b]
            ax.annotate("", xy=(xb, yb), xytext=(xa, ya),
                        arrowprops=dict(arrowstyle="->", color="purple",
                                        ls="--", lw=1.2), zorder=2)
    xs = [coords[q][0] for q in coords]
    ys = [coords[q][1] for q in coords]
    cvals = [pos_in_chain.get(q, -1) for q in coords]
    free = [q for q in coords if q not in pos_in_chain]
    ax.scatter([coords[q][0] for q in free], [coords[q][1] for q in free],
               s=60, c="white", edgecolors="gray", zorder=3)
    inpath = [q for q in coords if q in pos_in_chain]
    sc = ax.scatter([coords[q][0] for q in inpath],
                    [coords[q][1] for q in inpath],
                    s=90, c=[pos_in_chain[q] for q in inpath], cmap="viridis",
                    edgecolors="black", zorder=4)
    if layout.get("ancilla") is not None:
        q = layout["ancilla"]
        ax.scatter([coords[q][0]], [coords[q][1]], s=140, marker="s",
                   c="tab:red", edgecolors="black", zorder=5, label="ancilla")
        ax.legend()
    fig.colorbar(sc, ax=ax, label="chain position")
    ax.set_title(title)
    ax.invert_yaxis()
    ax.set_aspect("equal")
    import os

    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    fig.savefig(out_png, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_png
