from .tta import tta_split, tta_merge

__all__ = ["tta_split", "tta_merge"]
