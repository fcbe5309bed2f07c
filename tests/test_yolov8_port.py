"""Numerical proof of the ultralytics YOLOv8 weight importer.

No yolov8n.pt ships in this environment, so the ultralytics checkpoint
format is reproduced exactly: a torch mirror of the published yolov8
architecture (Conv+BN+SiLU / C2f / SPPF / anchor-free Detect, module
indices model.0..model.22 as in ultralytics' yaml) is built with RANDOM
weights AND random BatchNorm running statistics, its state_dict is fed
through `port_ultralytics_state_dict`, and the JAX model must reproduce
the torch forward per level. Any transpose, split-order, or key-mapping
bug in the importer fails this test.

Capability under test: the reference's pretrained-YOLO fusion quality
(`YOLO('yolov8n.pt')`, /root/reference/test3.py:470-472) depends on the
import being exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfa3d_tpu.models.yolov8 import YOLOv8, port_ultralytics_state_dict

torch = pytest.importorskip("torch")
tnn = torch.nn


class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TDetect(tnn.Module):
    def __init__(self, nc, ch):
        super().__init__()
        c2 = max(16, ch[0] // 4, 64)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3), tnn.Conv2d(c2, 64, 1))
            for c in ch
        )
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3), tnn.Conv2d(c3, nc, 1))
            for c in ch
        )
        # the fixed DFL conv real checkpoints carry (realized analytically in
        # the JAX decode; the importer must tolerate the key)
        self.dfl = tnn.Conv2d(16, 1, 1, bias=False)
        self.dfl.weight.data = torch.arange(16, dtype=torch.float32).view(1, 16, 1, 1)


class TYOLOv8(tnn.Module):
    """Ultralytics yolov8 module-index mirror (Identity at the param-free
    Upsample/Concat slots keeps state_dict indices aligned)."""

    def __init__(self, widths, depths, nc=80):
        super().__init__()
        w, d = widths, depths
        self.model = tnn.ModuleList(
            [
                TConv(3, w[0], 3, 2),                 # 0
                TConv(w[0], w[1], 3, 2),              # 1
                TC2f(w[1], w[1], d[0], True),         # 2
                TConv(w[1], w[2], 3, 2),              # 3
                TC2f(w[2], w[2], d[1], True),         # 4
                TConv(w[2], w[3], 3, 2),              # 5
                TC2f(w[3], w[3], d[2], True),         # 6
                TConv(w[3], w[4], 3, 2),              # 7
                TC2f(w[4], w[4], d[3], True),         # 8
                TSPPF(w[4], w[4], 5),                 # 9
                tnn.Identity(),                       # 10 Upsample
                tnn.Identity(),                       # 11 Concat
                TC2f(w[4] + w[3], w[3], d[3], False), # 12
                tnn.Identity(),                       # 13 Upsample
                tnn.Identity(),                       # 14 Concat
                TC2f(w[3] + w[2], w[2], d[3], False), # 15
                TConv(w[2], w[2], 3, 2),              # 16
                tnn.Identity(),                       # 17 Concat
                TC2f(w[3] + w[2], w[3], d[3], False), # 18
                TConv(w[3], w[3], 3, 2),              # 19
                tnn.Identity(),                       # 20 Concat
                TC2f(w[4] + w[3], w[4], d[3], False), # 21
                TDetect(nc, (w[2], w[3], w[4])),      # 22
            ]
        )

    def forward(self, x):
        m = self.model
        up = lambda t: tnn.functional.interpolate(t, scale_factor=2.0, mode="nearest")
        x = m[1](m[0](x))
        x = m[3](m[2](x))
        p3 = m[4](x)
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        n4 = m[12](torch.cat([up(p5), p4], 1))
        n3 = m[15](torch.cat([up(n4), p3], 1))
        n4o = m[18](torch.cat([m[16](n3), n4], 1))
        n5o = m[21](torch.cat([m[19](n4o), p5], 1))
        det = m[22]
        return [
            (det.cv2[i](f), det.cv3[i](f))
            for i, f in enumerate([n3, n4o, n5o])
        ]


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in model.modules():
            is_dfl = isinstance(mod, tnn.Conv2d) and (
                mod.out_channels == 1 and mod.kernel_size == (1, 1)
            )
            if isinstance(mod, tnn.Conv2d) and not is_dfl:
                mod.weight.normal_(0, 0.05, generator=g)
                if mod.bias is not None:
                    mod.bias.normal_(0, 0.05, generator=g)
            if isinstance(mod, tnn.BatchNorm2d):
                mod.weight.uniform_(0.5, 1.5, generator=g)
                mod.bias.normal_(0, 0.1, generator=g)
                mod.running_mean.normal_(0, 0.1, generator=g)
                mod.running_var.uniform_(0.5, 2.0, generator=g)


@pytest.mark.parametrize("scale", ["n", "s"])
def test_imported_ultralytics_weights_reproduce_torch_forward(scale):
    jmodel = YOLOv8(scale=scale)
    widths, depths = jmodel.widths(), jmodel.depths()
    tmodel = TYOLOv8(widths, depths)
    _randomize(tmodel, seed=0)
    tmodel.eval()

    sd = tmodel.state_dict()
    # mirror fidelity: every ultralytics-format key the importer consumes
    # must exist in the mirror, and shapes must line up with the JAX init
    variables = port_ultralytics_state_dict(sd, scale=scale)
    init = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_equal_shapes(variables, init)

    x = np.random.default_rng(1).normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    j_out = jmodel.apply(variables, jnp.asarray(x), train=False)

    assert len(j_out) == len(t_out) == 3
    for (jb, jc), (tb, tc) in zip(j_out, t_out):
        np.testing.assert_allclose(
            np.asarray(jb), tb.numpy().transpose(0, 2, 3, 1), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(jc), tc.numpy().transpose(0, 2, 3, 1), atol=2e-4
        )


def test_decode_matches_ultralytics_formula():
    """decode_predictions must equal the ultralytics eval-mode decode:
    make_anchors(grid+0.5) + DFL softmax-expectation + dist2bbox, xyxy
    scaled by stride (numpy oracle of ultralytics tal.py/head.py)."""
    from sfa3d_tpu.models.yolov8 import REG_MAX, STRIDES, decode_predictions

    rng = np.random.default_rng(2)
    levels = []
    oracle_boxes, oracle_scores = [], []
    for stride in STRIDES:
        hw = 64 // stride
        box = rng.normal(0, 1, (1, hw, hw, 4 * REG_MAX)).astype(np.float32)
        cls = rng.normal(0, 1, (1, hw, hw, 3)).astype(np.float32)
        levels.append((jnp.asarray(box), jnp.asarray(cls)))

        # oracle: per-anchor DFL expectation then anchor +/- ltrb
        logits = box.reshape(hw * hw, 4, REG_MAX)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ltrb = (p * np.arange(REG_MAX)).sum(-1)  # (A, 4)
        gy, gx = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
        ax = (gx + 0.5).reshape(-1)
        ay = (gy + 0.5).reshape(-1)
        xyxy = np.stack(
            [
                (ax - ltrb[:, 0]) * stride,
                (ay - ltrb[:, 1]) * stride,
                (ax + ltrb[:, 2]) * stride,
                (ay + ltrb[:, 3]) * stride,
            ],
            -1,
        )
        oracle_boxes.append(xyxy)
        oracle_scores.append(1 / (1 + np.exp(-cls.reshape(hw * hw, 3))))

    boxes, scores = decode_predictions(levels)
    np.testing.assert_allclose(
        np.asarray(boxes)[0], np.concatenate(oracle_boxes), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(scores)[0], np.concatenate(oracle_scores), atol=1e-5
    )
