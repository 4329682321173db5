"""Spectrogram visualization for validation logging.

Parity target: reference ``utils/utils.py:55-84`` — a target/output mel
figure rendered to an RGB numpy array for TensorBoard.  Matplotlib is
optional (headless images via the Agg backend); callers fall back to
saving raw ``.npy`` when it is unavailable.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    _HAS_MPL = True
except Exception:  # pragma: no cover
    _HAS_MPL = False


def plot_spectrogram_to_numpy(
    spec_target: np.ndarray, spec_output: np.ndarray
) -> Optional[np.ndarray]:
    """(n_mels, T) target/output pair → (H, W, 3) uint8 image, or None if
    matplotlib is unavailable."""
    if not _HAS_MPL:
        return None
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(12, 12))
    for ax, spec, title in ((ax1, spec_target, "Target"), (ax2, spec_output, "Output")):
        ax.set_title(title)
        im = ax.imshow(
            np.asarray(spec, np.float32), aspect="auto", origin="lower",
            interpolation="none",
        )
        fig.colorbar(im, ax=ax)
        ax.set_xlabel("Frames")
        ax.set_ylabel("Channels")
    fig.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return data


def save_spectrogram_plot(
    path: str, spec_target: np.ndarray, spec_output: np.ndarray
) -> str:
    """Render and save the comparison figure (PNG when matplotlib exists,
    .npy pair otherwise).  Returns the written path."""
    img = plot_spectrogram_to_numpy(spec_target, spec_output)
    if img is not None:
        from matplotlib import image as mpimg

        if not path.endswith(".png"):
            path += ".png"
        mpimg.imsave(path, img)
    else:  # pragma: no cover
        path += ".npz"
        np.savez(path, target=spec_target, output=spec_output)
    return path
