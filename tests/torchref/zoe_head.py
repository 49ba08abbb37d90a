"""Plain-torch ZoeDepth metric-bins head matching the released checkpoint
key layout (behavioral spec: the published ZoeDepth single-domain head —
SeedBinRegressorUnnormed, Projectors, AttractorLayerUnnormed,
ConditionalLogBinomial with log-binomial distribution)."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class SeedBinRegressorUnnormed(nn.Module):
    def __init__(self, in_features, n_bins=64, mlp_dim=256):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(in_features, mlp_dim, 1), nn.ReLU(),
            nn.Conv2d(mlp_dim, n_bins, 1), nn.Softplus())

    def forward(self, x):
        c = self._net(x)
        return c, c


class Projector(nn.Module):
    def __init__(self, in_features, out_features, mlp_dim=128):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(in_features, mlp_dim, 1), nn.ReLU(),
            nn.Conv2d(mlp_dim, out_features, 1))

    def forward(self, x):
        return self._net(x)


def inv_attractor(dx, alpha=300, gamma=2):
    return dx.div(1 + alpha * dx.pow(gamma).abs())


class AttractorLayerUnnormed(nn.Module):
    def __init__(self, in_features, n_attractors, mlp_dim=128, alpha=1000,
                 gamma=2, kind="mean"):
        super().__init__()
        self.n_attractors = n_attractors
        self.alpha = alpha
        self.gamma = gamma
        self.kind = kind
        self._net = nn.Sequential(
            nn.Conv2d(in_features, mlp_dim, 1), nn.ReLU(),
            nn.Conv2d(mlp_dim, n_attractors, 1), nn.Softplus())

    def forward(self, x, b_prev, prev_b_embedding=None):
        A = self._net(x)
        if b_prev.shape[-2:] != A.shape[-2:]:
            b_prev = F.interpolate(b_prev, A.shape[-2:], mode="bilinear",
                                   align_corners=True)
        # dx per (bin, attractor)
        dx = A.unsqueeze(1) - b_prev.unsqueeze(2)  # (B, n_bins, K, h, w)
        delta = inv_attractor(dx, self.alpha, self.gamma)
        delta = delta.mean(dim=2) if self.kind == "mean" else delta.sum(2)
        b_new = b_prev + delta
        return b_new, b_new


class ConditionalLogBinomial(nn.Module):
    def __init__(self, in_features, condition_dim, n_classes=64,
                 bottleneck_factor=4, p_eps=1e-4, max_temp=50.0,
                 min_temp=1e-7):
        super().__init__()
        self.K = n_classes
        self.p_eps = p_eps
        self.max_temp = max_temp
        self.min_temp = min_temp
        bottleneck = (in_features + condition_dim) // bottleneck_factor
        self.mlp = nn.Sequential(
            nn.Conv2d(in_features + condition_dim, bottleneck, 1),
            nn.GELU(),
            nn.Conv2d(bottleneck, 4, 1), nn.Softplus())

    def forward(self, x, cond):
        if cond.shape[-2:] != x.shape[-2:]:
            cond = F.interpolate(cond, x.shape[-2:], mode="bilinear",
                                 align_corners=True)
        pt = self.mlp(torch.cat([x, cond], dim=1))
        p, t = pt[:, :2], pt[:, 2:]
        p = (p + self.p_eps)
        p = p[:, 0] / (p[:, 0] + p[:, 1])
        t = t + 1e-4
        t = t[:, 0] / (t[:, 0] + t[:, 1])
        t = (self.max_temp - self.min_temp) * t + self.min_temp
        K = self.K
        k = torch.arange(K, dtype=torch.float32).view(1, K, 1, 1)
        log_coef = (torch.lgamma(torch.tensor(float(K)))
                    - torch.lgamma(k + 1)
                    - torch.lgamma(K - k))
        logits = (log_coef + k * torch.log(p).unsqueeze(1)
                  + (K - 1 - k) * torch.log1p(-p).unsqueeze(1))
        return torch.softmax(logits / t.unsqueeze(1), dim=1)


class ZoeBinsHead(nn.Module):
    """Key layout of the released ZoeDepth (single-domain) head."""

    def __init__(self, btlnck_features=256, n_bins=64, emb_dim=128,
                 n_attractors=(16, 8, 4, 1), min_temp=0.0212, max_temp=50.0):
        super().__init__()
        self.conv2 = nn.Conv2d(btlnck_features, btlnck_features, 1)
        self.seed_bin_regressor = SeedBinRegressorUnnormed(
            btlnck_features, n_bins, btlnck_features)
        self.seed_projector = Projector(btlnck_features, emb_dim)
        self.projectors = nn.ModuleList(
            [Projector(256, emb_dim) for _ in range(4)])
        self.attractors = nn.ModuleList(
            [AttractorLayerUnnormed(emb_dim, n_attractors[i])
             for i in range(4)])
        self.conditional_log_binomial = ConditionalLogBinomial(
            33, emb_dim, n_bins, min_temp=min_temp, max_temp=max_temp)

    def forward(self, rel_depth, features):
        out32, btlnck, *x_blocks = features
        x = self.conv2(btlnck)
        b_centers, _ = self.seed_bin_regressor(x)
        emb = self.seed_projector(x)
        for proj, attr, feat in zip(self.projectors, self.attractors,
                                    x_blocks):
            emb = proj(feat)
            b_centers, _ = attr(emb, b_centers)
        rel_cond = rel_depth.unsqueeze(1)
        if rel_cond.shape[-2:] != out32.shape[-2:]:
            rel_cond = F.interpolate(rel_cond, out32.shape[-2:],
                                     mode="bilinear", align_corners=True)
        last = torch.cat([out32, rel_cond], dim=1)
        probs = self.conditional_log_binomial(last, emb)
        if b_centers.shape[-2:] != probs.shape[-2:]:
            b_centers = F.interpolate(b_centers, probs.shape[-2:],
                                      mode="bilinear", align_corners=True)
        return torch.sum(probs * b_centers, dim=1, keepdim=True)
