from .base import BaseDepthModel
from .factory import create_depth_model, DEPTH_MODEL_TYPES
