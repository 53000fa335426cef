"""Lightweight structure/trajectory visualization (matplotlib).

Counterpart of the reference's `analysis/plotting.py` (plotly/geomstats
3D frame viewers, :15/:101/:241/:274), reduced to the dependency-free
essentials: CA-trace 3D plots, trajectory snapshots, and frame-axis
quiver plots. Matplotlib is imported lazily so headless training never
pays for it.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _ax3d(figsize=(6, 6)):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=figsize)
    return fig, fig.add_subplot(projection="3d")


def plot_ca_trace(
    atom37: np.ndarray,
    path: Optional[str] = None,
    color_by_index: bool = True,
    title: str = "",
):
    """3D CA trace; returns the matplotlib figure (saves if path given)."""
    fig, ax = _ax3d()
    ca = np.asarray(atom37)[:, 1]
    if color_by_index:
        ax.scatter(
            ca[:, 0], ca[:, 1], ca[:, 2], c=np.arange(len(ca)), cmap="viridis", s=12
        )
    ax.plot(ca[:, 0], ca[:, 1], ca[:, 2], lw=1.0, alpha=0.7, color="gray")
    ax.set_title(title)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
    return fig


def plot_frames(
    rigids_t7: np.ndarray, path: Optional[str] = None, scale: float = 2.0
):
    """Quiver plot of rigid frames: origin + local x/y/z axes."""
    from se3_diffusion_tpu.geometry import quat as ql
    import jax.numpy as jnp

    fig, ax = _ax3d()
    t7 = np.asarray(rigids_t7)
    rot = np.asarray(ql.quat_to_rotmat(jnp.asarray(t7[..., :4])))
    trans = t7[..., 4:]
    colors = ["tab:red", "tab:green", "tab:blue"]
    for axis in range(3):
        vec = rot[..., :, axis] * scale
        ax.quiver(
            trans[:, 0], trans[:, 1], trans[:, 2],
            vec[:, 0], vec[:, 1], vec[:, 2],
            color=colors[axis], length=1.0, normalize=False, linewidth=0.8,
        )
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
    return fig


def plot_traces(
    ca_traces: Sequence[np.ndarray],
    path: Optional[str] = None,
    labels: Optional[Sequence[str]] = None,
    title: str = "",
):
    """Overlay of several CA traces in one 3D plot (counterpart of
    reference `plot_traces`, `analysis/plotting.py:101-150`)."""
    fig, ax = _ax3d()
    for i, ca in enumerate(ca_traces):
        ca = np.asarray(ca)
        label = labels[i] if labels else None
        ax.plot(ca[:, 0], ca[:, 1], ca[:, 2], lw=1.2, alpha=0.8, label=label)
    if labels:
        ax.legend(loc="upper right", fontsize=8)
    ax.set_title(title)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
    return fig


def animate_trajectory(
    atom37_traj: np.ndarray,
    path: str,
    fps: int = 12,
    stride: int = 1,
    color_by_index: bool = True,
):
    """Animated GIF of a (reverse-)diffusion trajectory's CA trace
    (counterpart of reference `write_traj`, `analysis/plotting.py:274-316`,
    which emits a plotly HTML animation; here: dependency-free GIF via
    matplotlib + Pillow).

    Args:
        atom37_traj: [T, N, 37, 3]; index 0 is rendered first.
        path: output .gif path.
        stride: render every stride-th frame.
    """
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib import animation

    traj = np.asarray(atom37_traj)[::max(stride, 1)]
    cas = traj[:, :, 1]
    lo = cas.reshape(-1, 3).min(0) - 2.0
    hi = cas.reshape(-1, 3).max(0) + 2.0

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")

    def draw(i):
        ax.clear()
        ca = cas[i]
        if color_by_index:
            ax.scatter(
                ca[:, 0], ca[:, 1], ca[:, 2],
                c=np.arange(len(ca)), cmap="viridis", s=10,
            )
        ax.plot(ca[:, 0], ca[:, 1], ca[:, 2], lw=1.0, alpha=0.7, color="gray")
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_zlim(lo[2], hi[2])
        ax.set_title(f"frame {i * max(stride, 1)}/{len(cas) * max(stride, 1)}")
        ax.set_axis_off()
        return []

    anim = animation.FuncAnimation(
        fig, draw, frames=len(cas), interval=1000 // fps, blit=False
    )
    anim.save(path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return path


def plot_trajectory_snapshots(
    atom37_traj: np.ndarray,
    path: Optional[str] = None,
    num_snapshots: int = 6,
):
    """Grid of CA traces along a (reverse-)diffusion trajectory."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    traj = np.asarray(atom37_traj)
    steps = np.linspace(0, traj.shape[0] - 1, num_snapshots, dtype=int)
    fig = plt.figure(figsize=(3 * num_snapshots, 3))
    for i, s in enumerate(steps):
        ax = fig.add_subplot(1, num_snapshots, i + 1, projection="3d")
        ca = traj[s][:, 1]
        ax.plot(ca[:, 0], ca[:, 1], ca[:, 2], lw=1.0)
        ax.set_title(f"step {s}")
        ax.set_axis_off()
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
    return fig
