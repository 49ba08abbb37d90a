"""Video runtime: native C++ libav decode/encode + batched device pipeline.

Role parity target: reference nunif/utils/video.py (see SURVEY.md §3.2).
"""
from .engine import (
    VideoOutputConfig, FixedFPSRetimer, process_video, generate_video,
    guess_fps, KNOWN_CODECS,
    error_flag_path, write_error_flag, has_error_flag, clear_error_flag,
)
from .backend import VideoReader, VideoWriter, available, encoder_available
