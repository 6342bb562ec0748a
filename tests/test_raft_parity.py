"""RAFT graph parity: the JAX port + checkpoint converter vs a torch replica
of the official RAFT architecture (Teed & Deng, ECCV'20) with random weights
named exactly like the official `raft-things.pth` state dict — the same
validation pattern as tests/test_dpt.py (the RAFT/DPT submodules are not
checked out in this environment, so the replica is built from the published
architecture spec).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from localrf_tpu.preprocess.raft import raft_apply  # noqa: E402

H, W = 128, 160  # 1/8 feature map 16x20 supports the 4-level pyramid
ITERS = 3


# --------------------------------------------------------------------------
# random official-format state dict
# --------------------------------------------------------------------------


def _random_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(name, co, ci, kh, kw):
        sd[f"{name}.weight"] = torch.randn((co, ci, kh, kw), generator=g) * (
            1.0 / np.sqrt(ci * kh * kw)
        )
        sd[f"{name}.bias"] = torch.randn((co,), generator=g) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = torch.rand((c,), generator=g) + 0.5
        sd[f"{name}.bias"] = torch.randn((c,), generator=g) * 0.1
        sd[f"{name}.running_mean"] = torch.randn((c,), generator=g) * 0.1
        sd[f"{name}.running_var"] = torch.rand((c,), generator=g) + 0.5
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    def encoder(prefix, norm):
        conv(f"{prefix}.conv1", 64, 3, 7, 7)
        if norm == "batch":
            bn(f"{prefix}.norm1", 64)
        dims = {"layer1": (64, 64, 1), "layer2": (64, 96, 2), "layer3": (96, 128, 2)}
        for layer, (ci, co, stride) in dims.items():
            for bi in (0, 1):
                cin = ci if bi == 0 else co
                s = stride if bi == 0 else 1
                base = f"{prefix}.{layer}.{bi}"
                conv(f"{base}.conv1", co, cin, 3, 3)
                conv(f"{base}.conv2", co, co, 3, 3)
                if norm == "batch":
                    bn(f"{base}.norm1", co)
                    bn(f"{base}.norm2", co)
                if s != 1:
                    conv(f"{base}.downsample.0", co, cin, 1, 1)
                    if norm == "batch":
                        bn(f"{base}.norm3", co)
        conv(f"{prefix}.conv2", 256, 128, 1, 1)

    encoder("fnet", "instance")
    encoder("cnet", "batch")

    cor_planes = 4 * 9 * 9
    conv("update_block.encoder.convc1", 256, cor_planes, 1, 1)
    conv("update_block.encoder.convc2", 192, 256, 3, 3)
    conv("update_block.encoder.convf1", 128, 2, 7, 7)
    conv("update_block.encoder.convf2", 64, 128, 3, 3)
    conv("update_block.encoder.conv", 126, 256, 3, 3)
    for gname in ("z", "r", "q"):
        conv(f"update_block.gru.conv{gname}1", 128, 384, 1, 5)
        conv(f"update_block.gru.conv{gname}2", 128, 384, 5, 1)
    conv("update_block.flow_head.conv1", 256, 128, 3, 3)
    conv("update_block.flow_head.conv2", 2, 256, 3, 3)
    conv("update_block.mask.0", 256, 128, 3, 3)
    conv("update_block.mask.2", 64 * 9, 256, 1, 1)

    # the official checkpoint carries a DataParallel "module." prefix
    return {f"module.{k}": v for k, v in sd.items()}


# --------------------------------------------------------------------------
# torch replica of the official forward
# --------------------------------------------------------------------------


class _TorchRAFT:
    def __init__(self, sd):
        self.sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def conv(self, name, x, stride=1, padding=0):
        return F.conv2d(
            x, self.sd[f"{name}.weight"], self.sd[f"{name}.bias"],
            stride=stride, padding=padding,
        )

    def norm(self, name, x, kind):
        if kind == "instance":
            return F.instance_norm(x, eps=1e-5)
        return F.batch_norm(
            x, self.sd[f"{name}.running_mean"], self.sd[f"{name}.running_var"],
            self.sd[f"{name}.weight"], self.sd[f"{name}.bias"],
            training=False, eps=1e-5,
        )

    def res_block(self, base, x, kind, stride):
        y = F.relu(self.norm(f"{base}.norm1", self.conv(f"{base}.conv1", x, stride, 1), kind))
        y = F.relu(self.norm(f"{base}.norm2", self.conv(f"{base}.conv2", y, 1, 1), kind))
        if stride != 1:
            x = self.norm(f"{base}.norm3", self.conv(f"{base}.downsample.0", x, stride, 0), kind)
        return F.relu(x + y)

    def encoder(self, prefix, x, kind):
        x = F.relu(self.norm(f"{prefix}.norm1", self.conv(f"{prefix}.conv1", x, 2, 3), kind))
        for layer, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
            x = self.res_block(f"{prefix}.{layer}.0", x, kind, stride)
            x = self.res_block(f"{prefix}.{layer}.1", x, kind, 1)
        return self.conv(f"{prefix}.conv2", x, 1, 0)

    @staticmethod
    def bilinear_sampler(img, coords):
        h, w = img.shape[-2:]
        xgrid, ygrid = coords.split([1, 1], dim=-1)
        xgrid = 2 * xgrid / (w - 1) - 1
        ygrid = 2 * ygrid / (h - 1) - 1
        grid = torch.cat([xgrid, ygrid], dim=-1)
        return F.grid_sample(img, grid, align_corners=True)

    def corr_pyramid(self, f1, f2):
        b, d, h, w = f1.shape
        corr = torch.matmul(
            f1.view(b, d, h * w).transpose(1, 2), f2.view(b, d, h * w)
        ) / np.sqrt(d)
        corr = corr.reshape(b * h * w, 1, h, w)
        pyr = [corr]
        for _ in range(3):
            corr = F.avg_pool2d(corr, 2, stride=2)
            pyr.append(corr)
        return pyr

    def corr_lookup(self, pyr, coords):
        # coords: [B, 2, H, W] (x, y)
        r = 4
        b, _, h, w = coords.shape
        coords = coords.permute(0, 2, 3, 1)
        out = []
        for i, corr in enumerate(pyr):
            dx = torch.linspace(-r, r, 2 * r + 1)
            dy = torch.linspace(-r, r, 2 * r + 1)
            delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), dim=-1)
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2**i
            sampled = self.bilinear_sampler(corr, centroid + delta.view(1, 9, 9, 2))
            out.append(sampled.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).float()

    def motion_encoder(self, flow, corr):
        c = F.relu(self.conv("update_block.encoder.convc1", corr, 1, 0))
        c = F.relu(self.conv("update_block.encoder.convc2", c, 1, 1))
        f = F.relu(self.conv("update_block.encoder.convf1", flow, 1, 3))
        f = F.relu(self.conv("update_block.encoder.convf2", f, 1, 1))
        m = F.relu(self.conv("update_block.encoder.conv", torch.cat([c, f], 1), 1, 1))
        return torch.cat([m, flow], dim=1)

    def gru(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.conv("update_block.gru.convz1", hx, 1, (0, 2)))
        r = torch.sigmoid(self.conv("update_block.gru.convr1", hx, 1, (0, 2)))
        q = torch.tanh(self.conv("update_block.gru.convq1", torch.cat([r * h, x], 1), 1, (0, 2)))
        h = (1 - z) * h + z * q
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.conv("update_block.gru.convz2", hx, 1, (2, 0)))
        r = torch.sigmoid(self.conv("update_block.gru.convr2", hx, 1, (2, 0)))
        q = torch.tanh(self.conv("update_block.gru.convq2", torch.cat([r * h, x], 1), 1, (2, 0)))
        return (1 - z) * h + z * q

    def upsample_flow(self, flow, mask):
        n, _, h, w = flow.shape
        mask = mask.view(n, 1, 9, 8, 8, h, w)
        mask = torch.softmax(mask, dim=2)
        up = F.unfold(8 * flow, (3, 3), padding=1)
        up = up.view(n, 2, 9, 1, 1, h, w)
        up = torch.sum(mask * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3)
        return up.reshape(n, 2, 8 * h, 8 * w)

    @torch.no_grad()
    def forward(self, image1, image2, iters):
        img1 = 2 * (image1 / 255.0) - 1.0
        img2 = 2 * (image2 / 255.0) - 1.0
        f1 = self.encoder("fnet", img1, "instance")
        f2 = self.encoder("fnet", img2, "instance")
        pyr = self.corr_pyramid(f1, f2)
        cmap = self.encoder("cnet", img1, "batch")
        net, inp = torch.split(cmap, [128, 128], dim=1)
        net, inp = torch.tanh(net), F.relu(inp)

        b, _, h, w = f1.shape
        ys, xs = torch.meshgrid(
            torch.arange(h).float(), torch.arange(w).float(), indexing="ij"
        )
        coords0 = torch.stack([xs, ys])[None].repeat(b, 1, 1, 1)
        coords1 = coords0.clone()
        for _ in range(iters):
            corr = self.corr_lookup(pyr, coords1)
            flow = coords1 - coords0
            motion = self.motion_encoder(flow, corr)
            net = self.gru(net, torch.cat([inp, motion], dim=1))
            dflow = self.conv(
                "update_block.flow_head.conv2",
                F.relu(self.conv("update_block.flow_head.conv1", net, 1, 1)),
                1, 1,
            )
            coords1 = coords1 + dflow
        m = F.relu(self.conv("update_block.mask.0", net, 1, 1))
        mask = 0.25 * self.conv("update_block.mask.2", m, 1, 0)
        return self.upsample_flow(coords1 - coords0, mask)


# --------------------------------------------------------------------------


def test_replica_matches_official_checkpoint_manifest():
    """The replica's parameter inventory must match the frozen key/shape
    listing of the official raft-things.pth (tests/raft_things_manifest.py,
    annotated against the RAFT paper's layer table). Guards against the
    replica and the JAX port agreeing only via a shared misreading of the
    architecture (VERDICT r2 #9)."""
    from raft_things_manifest import OFFICIAL_RAFT_THINGS_MANIFEST

    sd = _random_state_dict()
    inventory = {k: tuple(v.shape) for k, v in sd.items()}
    assert inventory == OFFICIAL_RAFT_THINGS_MANIFEST


def test_raft_graph_parity_vs_torch_replica(tmp_path):
    from localrf_tpu.preprocess.convert import convert_raft_checkpoint

    sd = _random_state_dict()
    ckpt = tmp_path / "raft_random.pth"
    torch.save(sd, ckpt)
    params = convert_raft_checkpoint(str(ckpt))

    rng = np.random.default_rng(3)
    im1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    im2 = np.clip(
        im1 + rng.normal(0, 8, im1.shape).astype(np.float32), 0, 255
    )

    ours = np.asarray(raft_apply(params, im1, im2, iters=ITERS))  # [B,H,W,2]

    t1 = torch.from_numpy(im1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(im2).permute(0, 3, 1, 2)
    ref = _TorchRAFT(sd).forward(t1, t2, iters=ITERS)
    ref = ref.permute(0, 2, 3, 1).numpy()

    scale = np.maximum(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(ours / scale, ref / scale, rtol=1e-3, atol=2e-4)
