"""Video runtime: native C++ libav decode/encode + batched device pipeline.

Role parity target: reference nunif/utils/video.py (see SURVEY.md §3.2).
"""
from .engine import (
    VideoOutputConfig, FixedFPSRetimer, process_video, generate_video,
    guess_fps, KNOWN_CODECS,
)
from .backend import VideoReader, VideoWriter, available, encoder_available
