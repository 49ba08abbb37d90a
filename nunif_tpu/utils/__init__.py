from .tiling import (
    TileConfig, make_tile_config, make_blend_filter, TiledRenderer, simple_render,
)

__all__ = [
    "TileConfig", "make_tile_config", "make_blend_filter",
    "TiledRenderer", "simple_render",
]
