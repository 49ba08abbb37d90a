"""dino — L4SN spectral-norm feature network (GAN perceptual loss backbone).

Capability parity target: reference dino/models/l4sn.py (SURVEY.md §2.5).
"""
from .l4sn import L4SN, L4SNFeature, l4sn_feature_loss
