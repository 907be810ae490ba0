"""Independent NCHW PyTorch pose_resnet — the torch forward ORACLE for the
SimpleBaseline model family.

Same evidence standard as ``tests/torch_hrnet.py`` (VERDICT round-2 item 1):
this module is written directly from the public SimpleBaselines architecture
(Xiao et al., ECCV 2018; reference expected path ``lib/models/pose_resnet.py``
per the HRNet-family layout, SURVEY.md §1) with the reference's tensor naming
(``conv1``/``bn1``, ``layer{l}.{b}`` with ``downsample.{0,1}``,
``deconv_layers`` sequential indices, ``final_layer``). It is deliberately
NOT derived from anything in ``rsgnet_tpu`` — feeding it exported flax
weights and comparing forwards catches semantic divergences (stem padding,
maxpool convention, downsample placement, transposed-conv padding/
output_padding, BN eps) that no naming bijection can.
"""
from __future__ import annotations

import torch
import torch.nn as nn

BN_MOMENTUM = 0.1

RESNET_SPEC = {
    18: ("BASIC", (2, 2, 2, 2)),
    34: ("BASIC", (3, 4, 6, 3)),
    50: ("BOTTLENECK", (3, 4, 6, 3)),
    101: ("BOTTLENECK", (3, 4, 23, 3)),
    152: ("BOTTLENECK", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes, momentum=BN_MOMENTUM)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes, momentum=BN_MOMENTUM)
        self.downsample = downsample

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, momentum=BN_MOMENTUM)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes, momentum=BN_MOMENTUM)
        self.conv3 = nn.Conv2d(planes, planes * self.expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion,
                                  momentum=BN_MOMENTUM)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}

# kernel -> (padding, output_padding): the reference's _get_deconv_cfg
DECONV_CFG = {4: (1, 0), 3: (1, 1), 2: (0, 0)}


class PoseResNet(nn.Module):
    """NCHW torch pose_resnet built from the same EXTRA config."""

    def __init__(self, cfg):
        super().__init__()
        extra = cfg.MODEL.EXTRA
        block_name, stage_blocks = RESNET_SPEC[extra.NUM_LAYERS]
        block = BLOCKS[block_name]

        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64, momentum=BN_MOMENTUM)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

        self.inplanes = 64
        for li, n in enumerate(stage_blocks, start=1):
            planes = 64 * (2 ** (li - 1))
            stride = 1 if li == 1 else 2
            setattr(self, f"layer{li}",
                    self._make_layer(block, planes, n, stride))

        layers = []
        cin = self.inplanes
        for i in range(extra.NUM_DECONV_LAYERS):
            k = extra.NUM_DECONV_KERNELS[i]
            p, op = DECONV_CFG[k]
            cout = extra.NUM_DECONV_FILTERS[i]
            layers += [nn.ConvTranspose2d(cin, cout, k, stride=2, padding=p,
                                          output_padding=op,
                                          bias=extra.DECONV_WITH_BIAS),
                       nn.BatchNorm2d(cout, momentum=BN_MOMENTUM),
                       nn.ReLU(inplace=True)]
            cin = cout
        self.deconv_layers = nn.Sequential(*layers)

        k = extra.FINAL_CONV_KERNEL
        self.final_layer = nn.Conv2d(cin, cfg.MODEL.NUM_JOINTS, k,
                                     padding=1 if k == 3 else 0)

    def _make_layer(self, block, planes, n, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride=stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion,
                               momentum=BN_MOMENTUM))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes) for _ in range(1, n)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = self.deconv_layers(x)
        return self.final_layer(x)


@torch.no_grad()
def torch_forward(cfg, state_dict, x_nchw):
    """Build the oracle, load a torch-style state_dict, run eval forward."""
    model = PoseResNet(cfg)
    model.eval()
    sd = {k: torch.as_tensor(v) for k, v in state_dict.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    bad_missing = [k for k in missing if "num_batches_tracked" not in k]
    assert not bad_missing, f"oracle missing tensors: {bad_missing[:8]}"
    assert not unexpected, f"oracle unexpected tensors: {unexpected[:8]}"
    return model(torch.as_tensor(x_nchw)).numpy()
