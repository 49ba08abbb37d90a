"""imagenet — classifier training for perceptual-loss backbones.

Capability parity target: reference imagenet/ (SURVEY.md §2.5): trains
vgg11-bn / swin-t style classifiers whose features feed perceptual losses.
"""
from . import models  # noqa: F401 — register
