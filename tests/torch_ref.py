"""Compact torch fixtures reproducing the reference model topologies
(documented in SURVEY §2.3; reference src/models/unetpp.py:29-135,
src/models/simple_unet.py:20-128) for activation-parity tests of the Flax
ports. Test-only code — the framework itself never imports torch."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class TConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(x)))


class TNestedUNet(nn.Module):
    """Same graph + state-dict keys as the reference NestedUNet (custom encoder)."""

    def __init__(self, num_classes, input_channels=3, deep_supervision=True):
        super().__init__()
        self.deep_supervision = deep_supervision
        f = [32, 64, 128, 256, 512]
        self.conv0_0 = TConvBlock(input_channels, f[0])
        self.conv1_0 = TConvBlock(f[0], f[1])
        self.conv2_0 = TConvBlock(f[1], f[2])
        self.conv3_0 = TConvBlock(f[2], f[3])
        self.conv4_0 = TConvBlock(f[3], f[4])
        self.conv3_1 = TConvBlock(f[3] + f[4], f[3])
        self.conv2_2 = TConvBlock(f[2] + f[3], f[2])
        self.conv1_3 = TConvBlock(f[1] + f[2], f[1])
        self.conv0_4 = TConvBlock(f[0] + f[1], f[0])
        self.final = nn.Conv2d(f[0], num_classes, 1)
        if deep_supervision:
            self.ds3_1 = nn.Conv2d(f[3], num_classes, 1)
            self.ds2_2 = nn.Conv2d(f[2], num_classes, 1)
            self.ds1_3 = nn.Conv2d(f[1], num_classes, 1)

    def forward(self, x):
        pool = lambda t: F.max_pool2d(t, 2, 2)
        up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=True)
        x0_0 = self.conv0_0(x)
        x1_0 = self.conv1_0(pool(x0_0))
        x2_0 = self.conv2_0(pool(x1_0))
        x3_0 = self.conv3_0(pool(x2_0))
        x4_0 = self.conv4_0(pool(x3_0))
        x3_1 = self.conv3_1(torch.cat([x3_0, up(x4_0)], 1))
        x2_2 = self.conv2_2(torch.cat([x2_0, up(x3_1)], 1))
        x1_3 = self.conv1_3(torch.cat([x1_0, up(x2_2)], 1))
        x0_4 = self.conv0_4(torch.cat([x0_0, up(x1_3)], 1))
        out = self.final(x0_4)
        if self.deep_supervision and self.training:
            sz = x.shape[2:]
            rs = lambda t: F.interpolate(t, size=sz, mode="bilinear", align_corners=True)
            return [out, rs(self.ds1_3(x1_3)), rs(self.ds2_2(x2_2)), rs(self.ds3_1(x3_1))]
        return out


class TSimpleUNet(nn.Module):
    """Same keys as reference SimpleUNet (enc1.0 layout)."""

    def __init__(self, num_classes=7, num_channels=3):
        super().__init__()
        def block(cin, cout):
            return nn.ModuleList([nn.Conv2d(cin, cout, 3, padding=1), nn.ReLU(),
                                  nn.Conv2d(cout, cout, 3, padding=1), nn.ReLU()])
        self.enc1 = block(num_channels, 64)
        self.enc2 = block(64, 128)
        self.enc3 = block(128, 256)
        self.enc4 = block(256, 512)
        self.up3 = nn.ConvTranspose2d(512, 256, 2, 2)
        self.up2 = nn.ConvTranspose2d(256, 128, 2, 2)
        self.up1 = nn.ConvTranspose2d(128, 64, 2, 2)
        self.dec3 = block(512, 256)
        self.dec2 = block(256, 128)
        self.dec1 = block(128, 64)
        self.final = nn.Conv2d(64, num_classes, 1)

    def forward(self, x):
        run = lambda blk, t: blk[3](blk[2](blk[1](blk[0](t))))
        pool = lambda t: F.max_pool2d(t, 2, 2)
        e1 = run(self.enc1, x)
        e2 = run(self.enc2, pool(e1))
        e3 = run(self.enc3, pool(e2))
        e4 = run(self.enc4, pool(e3))
        d3 = run(self.dec3, torch.cat([self.up3(e4), e3], 1))
        d2 = run(self.dec2, torch.cat([self.up2(d3), e2], 1))
        d1 = run(self.dec1, torch.cat([self.up1(d2), e1], 1))
        return self.final(d1)


class TCNA(nn.Sequential):
    """Conv-BN-Act with torchvision Conv2dNormActivation key layout."""

    def __init__(self, cin, cout, k, stride=1, groups=1, act="hs"):
        layers = [nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                            bias=False),
                  nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01)]
        if act == "hs":
            layers.append(nn.Hardswish())
        elif act == "relu":
            layers.append(nn.ReLU())
        super().__init__(*layers)


class TSE(nn.Module):
    def __init__(self, channels, squeeze):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, channels, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.hardsigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class TInvertedResidual(nn.Module):
    def __init__(self, cin, k, exp, out, use_se, act, stride, make_div):
        super().__init__()
        layers = []
        if exp != cin:
            layers.append(TCNA(cin, exp, 1, act=act))
        layers.append(TCNA(exp, exp, k, stride, groups=exp, act=act))
        if use_se:
            layers.append(TSE(exp, make_div(exp // 4)))
        layers.append(TCNA(exp, out, 1, act="none"))
        self.block = nn.Sequential(*layers)
        self.use_res = stride == 1 and cin == out

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class TMobileNetV3Features(nn.Module):
    """torchvision-key-compatible mobilenet_v3 features stack built from the
    same spec tables as the Flax encoder."""

    def __init__(self, spec, last):
        super().__init__()
        from unet_tpu.models.mobilenet import _make_divisible
        layers = [TCNA(3, 16, 3, 2, act="hs")]
        cin = 16
        for (k, exp, out, use_se, act, stride) in spec:
            layers.append(TInvertedResidual(cin, k, exp, out, use_se, act,
                                            stride, _make_divisible))
            cin = out
        layers.append(TCNA(cin, last, 1, act="hs"))
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


class TBottleneck(nn.Module):
    """torchvision Bottleneck key layout (conv1/bn1/conv2/bn2/conv3/bn3,
    downsample.0/1)."""

    def __init__(self, cin, width, stride=1, project=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = None
        if project:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                nn.BatchNorm2d(width * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        return F.relu(self.bn3(self.conv3(y)) + r)


class TNestedUNetResNet50(nn.Module):
    """Reference NestedUNet with the resnet50 pretrained-encoder wiring and
    its state-dict key layout (conv0_0 = Sequential(conv1,bn1,relu,maxpool),
    conv1_0..conv4_0 = layer1..4; reference src/models/unetpp.py:56-91)."""

    def __init__(self, num_classes=3):
        super().__init__()
        self.conv0_0 = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(), nn.MaxPool2d(3, 2, 1))

        def layer(cin, width, blocks, stride):
            mods = [TBottleneck(cin, width, stride, project=True)]
            mods += [TBottleneck(width * 4, width) for _ in range(blocks - 1)]
            return nn.Sequential(*mods)

        self.conv1_0 = layer(64, 64, 3, 1)
        self.conv2_0 = layer(256, 128, 4, 2)
        self.conv3_0 = layer(512, 256, 6, 2)
        self.conv4_0 = layer(1024, 512, 3, 2)
        ch = [64, 256, 512, 1024, 2048]
        self.conv3_1 = TConvBlock(ch[3] + ch[4], ch[3])
        self.conv2_2 = TConvBlock(ch[2] + ch[3], ch[2])
        self.conv1_3 = TConvBlock(ch[1] + ch[2], ch[1])
        self.conv0_4 = TConvBlock(ch[0] + ch[1], ch[0])
        self.final = nn.Conv2d(ch[0], num_classes, 1)

    def forward(self, x):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear",
                                     align_corners=True)
        x0_0 = self.conv0_0(x)
        x1_0 = self.conv1_0(x0_0)
        x2_0 = self.conv2_0(x1_0)
        x3_0 = self.conv3_0(x2_0)
        x4_0 = self.conv4_0(x3_0)
        x3_1 = self.conv3_1(torch.cat([x3_0, up(x4_0)], 1))
        x2_2 = self.conv2_2(torch.cat([x2_0, up(x3_1)], 1))
        x1_3 = self.conv1_3(torch.cat([x1_0, up(x2_2)], 1))
        x0_4 = self.conv0_4(torch.cat([x0_0, up(x1_3)], 1))
        return self.final(x0_4)
