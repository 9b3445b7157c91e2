from . import checkpoint, config, logger, nn, profiling, rng
from .gridsample import grid_sample_plane, sample_triplane_features
from .triplane import (Triplane, compose_featmaps, decompose_featmaps,
                       load_triplane_npz, pad_triplane, randn, randn_like,
                       save_triplane_npz, zeros_like)
