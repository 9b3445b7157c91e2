"""Seeding helpers (`/root/reference/src/utils/common_util.py:7-13`).

JAX is functionally seeded (explicit PRNG keys), so `seed_all` covers the
host-side RNGs (python / numpy) that the data pipeline uses; determinism of
device compute follows from key discipline, replacing the reference's
cudnn.deterministic switch.
"""

import random

import numpy as np


def seed_all(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def draw_scalar_field2D(field, vmin=None, vmax=None):
    """Matplotlib heatmap figure for logging
    (`common_util.py:16-22`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure()
    ax = fig.add_subplot(111)
    im = ax.imshow(field, vmin=vmin, vmax=vmax)
    fig.colorbar(im, ax=ax)
    return fig
