"""stlizer — conservative video stabilizer.

Capability parity target: reference stlizer/ (SURVEY.md §2.5): SuperPoint
keypoints -> per-frame shift/angle estimation -> trajectory smoothing
(gaussian/savgol/gradient-optimized) -> affine warp with border policies,
with an md5-keyed transform cache.
"""
from .pipeline import stabilize_video, calc_scene_weight
