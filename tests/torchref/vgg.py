"""torchvision vgg11_bn oracle (torchvision absent from this env).

State-dict keys match torchvision's exactly (`features.<i>.*`,
`classifier.<i>.*` via Sequential indices) so convert_vgg11_bn consumes
this state dict identically to a real torchvision checkpoint.
Reference: torchvision.models.vgg.vgg11_bn (cfg "A", batch_norm=True),
wrapped unmodified by /root/reference/imagenet/models/torchvision_models.py:10.
"""
import torch.nn as nn

_CFG_A = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


class VGG11BN(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        layers = []
        in_c = 3
        for c in _CFG_A:
            if c == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_c, c, 3, padding=1),
                           nn.BatchNorm2d(c), nn.ReLU(inplace=True)]
                in_c = c
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(x.flatten(1))
