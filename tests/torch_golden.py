"""Golden torch reimplementation of the reference model blocks.

SURVEY.md §4 "Golden parity vs torch": the reference repo could not be read
(empty mount), so the reference's building blocks — torchvision-style
R(2+1)D-18, a conv2d audio branch, ``torch.nn.GRU`` — are re-implemented here
with torch 2.13-CPU, and the jax models must match them through the weight
converter.  Key names intentionally mirror torchvision ``video/resnet.py`` so
``convert_r2plus1d`` also accepts real IG-65M/Kinetics checkpoints.
"""

import torch
import torch.nn as nn


def midplanes(in_planes, out_planes):
    return (in_planes * out_planes * 3 * 3 * 3) // (in_planes * 3 * 3 + 3 * out_planes)


class Conv2Plus1D(nn.Sequential):
    def __init__(self, in_planes, out_planes, mid, stride=1):
        super().__init__(
            nn.Conv3d(in_planes, mid, (1, 3, 3), stride=(1, stride, stride),
                      padding=(0, 1, 1), bias=False),
            nn.BatchNorm3d(mid),
            nn.ReLU(inplace=True),
            nn.Conv3d(mid, out_planes, (3, 1, 1), stride=(stride, 1, 1),
                      padding=(1, 0, 0), bias=False),
        )


def _conv_builder(kind, in_planes, out_planes, mid, stride):
    """torchvision video/resnet.py conv trio (key schema preserved)."""
    if kind == "2plus1d":
        return Conv2Plus1D(in_planes, out_planes, mid, stride), \
            (stride, stride, stride)
    if kind == "3d":       # Conv3DSimple
        return nn.Conv3d(in_planes, out_planes, 3, stride=stride, padding=1,
                         bias=False), (stride, stride, stride)
    if kind == "no_temporal":  # Conv3DNoTemporal
        return nn.Conv3d(in_planes, out_planes, (1, 3, 3),
                         stride=(1, stride, stride), padding=(0, 1, 1),
                         bias=False), (1, stride, stride)
    raise ValueError(kind)


class BasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, se_ratio=0,
                 conv_kind="2plus1d"):
        super().__init__()
        # torchvision video/resnet.py computes midplanes ONCE per block from
        # (inplanes, planes) and reuses it for BOTH convs
        mid = midplanes(inplanes, planes)
        c1, ds_stride = _conv_builder(conv_kind, inplanes, planes, mid, stride)
        c2, _ = _conv_builder(conv_kind, planes, planes, mid, 1)
        self.conv1 = nn.Sequential(c1, nn.BatchNorm3d(planes),
                                   nn.ReLU(inplace=True))
        self.conv2 = nn.Sequential(c2, nn.BatchNorm3d(planes))
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv3d(inplanes, planes, 1, stride=ds_stride, bias=False),
                nn.BatchNorm3d(planes))
        self.se = None
        if se_ratio:
            r = max(planes // se_ratio, 1)
            self.se = nn.Sequential(nn.Linear(planes, r), nn.ReLU(inplace=True),
                                    nn.Linear(r, planes))

    def forward(self, x):
        residual = x if self.downsample is None else self.downsample(x)
        out = self.conv2(self.conv1(x))
        if self.se is not None:
            w = torch.sigmoid(self.se(out.mean(dim=(2, 3, 4))))
            out = out * w[:, :, None, None, None]
        return self.relu(out + residual)


class R2Plus1DGolden(nn.Module):
    """torchvision-schema R(2+1)D-18 backbone → [B, 512] features (NCDHW in)."""

    def __init__(self, channels=(64, 128, 256, 512), blocks=(2, 2, 2, 2),
                 se_ratio=0, conv_mode="2plus1d"):
        super().__init__()
        if conv_mode == "2plus1d":
            self.stem = nn.Sequential(
                nn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2), padding=(0, 3, 3),
                          bias=False),
                nn.BatchNorm3d(45), nn.ReLU(inplace=True),
                nn.Conv3d(45, 64, (3, 1, 1), padding=(1, 0, 0), bias=False),
                nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        else:  # torchvision BasicStem (r3d_18 / mc3_18)
            self.stem = nn.Sequential(
                nn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2),
                          padding=(1, 3, 3), bias=False),
                nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        inplanes = 64
        for si, (c, n) in enumerate(zip(channels, blocks), start=1):
            kind = {"2plus1d": "2plus1d", "3d": "3d",
                    "mc3": "3d" if si == 1 else "no_temporal"}[conv_mode]
            layers = []
            for bi in range(n):
                layers.append(BasicBlock(inplanes, c,
                                         stride=2 if (si > 1 and bi == 0) else 1,
                                         se_ratio=se_ratio, conv_kind=kind))
                inplanes = c
            setattr(self, f"layer{si}", nn.Sequential(*layers))
        self.num_stages = len(channels)
        self.avgpool = nn.AdaptiveAvgPool3d(1)

    def forward(self, x, per_frame=False):
        x = self.stem(x)
        for si in range(1, self.num_stages + 1):
            x = getattr(self, f"layer{si}")(x)
        if per_frame:
            return x.mean(dim=(3, 4)).transpose(1, 2)  # [B, T', C]
        return self.avgpool(x).flatten(1)


class AudioCNNGolden(nn.Module):
    """Mirror of m3f.pytorch_tpu.models.audio.AudioCNN (NCHW in)."""

    def __init__(self, channels=(32, 64, 128, 256), feature_dim=256):
        super().__init__()
        convs, bns = [], []
        in_c = 1
        for c in channels:
            convs.append(nn.Conv2d(in_c, c, 3, stride=2, padding=1, bias=False))
            bns.append(nn.BatchNorm2d(c))
            in_c = c
        self.convs = nn.ModuleList(convs)
        self.bns = nn.ModuleList(bns)
        self.head = nn.Linear(in_c, feature_dim)

    def forward(self, mel, per_frame=False):  # [B, 1, F, n_mels]
        x = mel
        for c, b in zip(self.convs, self.bns):
            x = torch.relu(b(c(x)))
        if per_frame:
            x = x.mean(dim=3).transpose(1, 2)  # [B, F', C]
        else:
            x = x.mean(dim=(2, 3))
        return self.head(x)


class M3FGolden(nn.Module):
    """Reference-shaped fusion model: branch feats → concat → BiGRU → FC → tanh."""

    def __init__(self, use_audio=True, use_video=True, gru_hidden=256,
                 audio_dim=256, visual_dim=512, num_layers=1,
                 per_frame=False, frames_per_window=16):
        super().__init__()
        self.use_audio, self.use_video = use_audio, use_video
        self.per_frame, self.frames_per_window = per_frame, frames_per_window
        fused = (audio_dim if use_audio else 0) + (visual_dim if use_video else 0)
        if use_video:
            self.visual = R2Plus1DGolden()
        if use_audio:
            self.audio = AudioCNNGolden(feature_dim=audio_dim)
        self.gru = nn.GRU(fused, gru_hidden, num_layers=num_layers,
                          batch_first=True, bidirectional=True)
        self.head = nn.Linear(2 * gru_hidden, 2)

    @staticmethod
    def _upsample(x, length):
        # mirrors m3f models/m3f.py:_upsample_nearest: idx[l] = floor(l·T'/L)
        tp = x.shape[1]
        if tp == length:
            return x
        idx = (torch.arange(length) * tp) // length
        return x.index_select(1, idx)

    def forward(self, video=None, mel=None):
        # video: [B, W, C, T, H, W'], mel: [B, W, 1, F, n_mels]
        pf = self.per_frame
        if pf:
            L = video.shape[3] if video is not None else self.frames_per_window
        feats = []
        if self.use_video:
            b, w = video.shape[:2]
            vf = self.visual(video.reshape(b * w, *video.shape[2:]), per_frame=pf)
            if pf:
                feats.append(self._upsample(vf, L).reshape(b, w * L, -1))
            else:
                feats.append(vf.reshape(b, w, -1))
        if self.use_audio:
            b, w = mel.shape[:2]
            af = self.audio(mel.reshape(b * w, *mel.shape[2:]), per_frame=pf)
            if pf:
                feats.append(self._upsample(af, L).reshape(b, w * L, -1))
            else:
                feats.append(af.reshape(b, w, -1))
        fused = torch.cat(feats, dim=-1)
        seq, _ = self.gru(fused)
        out = torch.tanh(self.head(seq))
        if pf:
            out = out.reshape(out.shape[0], -1, L, out.shape[-1])
        return out


def state_dict_numpy(module: nn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}
