"""iw3 — 2D to stereo-3D conversion (TPU-native).

Capability parity target: reference iw3/ (see SURVEY.md §2.4): monocular
depth estimation -> mapper curves -> stereo warping (backward grid-sample,
depth-ordered forward splat, learned row_flow / MLBW delta warps) ->
SBS/TB/anaglyph/VR180 composition.
"""
from .mapper import get_mapper, resolve_mapper_function, resolve_mapper_name
from .backward_warp import (
    apply_divergence_grid_sample, apply_divergence_nn_LR, make_input_tensor,
)
from .forward_warp import apply_divergence_forward_warp
from .depth_scaler import EMAMinMaxScaler
from .anaglyph import apply_anaglyph_redcyan
from .equirectangular import equirectangular_projection
from .composition import StereoFormat, postprocess_image
from .pipeline import StereoConfig, process_image, apply_divergence
from . import models  # noqa: F401 — register sbs.* models
