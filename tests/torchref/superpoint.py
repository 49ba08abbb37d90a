"""Plain-torch SuperPoint dense trunk matching the reference checkpoint
format (behavioral spec: reference nunif/utils/superpoint.py:55-134;
the published SuperPoint architecture)."""
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


class VGGBlock(nn.Sequential):
    def __init__(self, c_in, c_out, kernel_size, relu=True):
        padding = (kernel_size - 1) // 2
        super().__init__(OrderedDict([
            ("conv", nn.Conv2d(c_in, c_out, kernel_size, 1, padding)),
            ("activation", nn.ReLU() if relu else nn.Identity()),
            ("bn", nn.BatchNorm2d(c_out, eps=0.001)),
        ]))


def simple_nms(scores, nms_radius):
    def mp(x):
        return F.max_pool2d(x, nms_radius * 2 + 1, stride=1,
                            padding=nms_radius)

    zeros = torch.zeros_like(scores)
    max_mask = scores == mp(scores)
    for _ in range(2):
        supp_mask = mp(max_mask.float()) > 0
        supp_scores = torch.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == mp(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return torch.where(max_mask, scores, zeros)


class SuperPoint(nn.Module):
    def __init__(self, channels=(64, 64, 128, 128, 256),
                 descriptor_dim=256, nms_radius=4, remove_borders=4):
        super().__init__()
        self.nms_radius = nms_radius
        self.remove_borders_n = remove_borders
        self.stride = 2 ** (len(channels) - 2)
        chans = [1, *channels[:-1]]
        backbone = []
        for i, c in enumerate(chans[1:], 1):
            layers = [VGGBlock(chans[i - 1], c, 3), VGGBlock(c, c, 3)]
            if i < len(chans) - 1:
                layers.append(nn.MaxPool2d(2, 2))
            backbone.append(nn.Sequential(*layers))
        self.backbone = nn.Sequential(*backbone)
        c = channels[-1]
        self.detector = nn.Sequential(
            VGGBlock(chans[-1], c, 3),
            VGGBlock(c, self.stride ** 2 + 1, 1, relu=False))
        self.descriptor = nn.Sequential(
            VGGBlock(chans[-1], c, 3),
            VGGBlock(c, descriptor_dim, 1, relu=False))

    def forward(self, image):
        if image.shape[1] == 3:
            scale = image.new_tensor([0.299, 0.587, 0.114]).view(1, 3, 1, 1)
            image = (image * scale).sum(1, keepdim=True)
        features = self.backbone(image)
        descriptors_dense = F.normalize(self.descriptor(features), p=2, dim=1)
        scores = self.detector(features)
        scores = F.softmax(scores, 1)[:, :-1]
        b, _, h, w = scores.shape
        scores = scores.permute(0, 2, 3, 1).reshape(
            b, h, w, self.stride, self.stride)
        scores = scores.permute(0, 1, 3, 2, 4).reshape(
            b, h * self.stride, w * self.stride)
        scores = simple_nms(scores, self.nms_radius)
        if self.remove_borders_n:
            pad = self.remove_borders_n
            scores[:, :pad] = -1
            scores[:, :, :pad] = -1
            scores[:, -pad:] = -1
            scores[:, :, -pad:] = -1
        return scores, descriptors_dense
