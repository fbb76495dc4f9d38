"""Plain-torch oracle of the reference numerics — no PyG dependency.

Independent re-statement (for golden parity tests) of:

  * MLP block semantics: Lin -> ReLU -> BatchNorm1d(momentum=0.1) per stage
    (models/basic_modules.py:31-36)
  * EdgeConv message passing: max_j nn([x_i, x_j - x_i]) over undirected
    edges + self-loops (models/basic_modules.py:142-162)
  * GCU: tpl + geo EdgeConv, concat, fuse MLP (basic_modules.py:165-177)
  * GCUMotion: per-edge feature + position message MLPs (basic_modules.py:179-219)
  * CorrNet mesh branch: 4x GCU + skip concat + global max + head, L2
    normalized (models/corrnet.py:17-22,39-48)
  * infoNCE: per-sample symmetric CE loop (models/customized_losses.py:107-134)

Attribute names reproduce the reference's state_dict key layout so that
`module.state_dict()` can be fed straight into morig_tpu.eval.torch_import —
the same code path a real reference checkpoint would take.
"""
from __future__ import annotations

import torch
import torch.nn as nn


def mlp(channels, batch_norm=True):
    """Lin -> ReLU -> BN1d stacks (basic_modules.py:31-36)."""
    stages = []
    for i in range(1, len(channels)):
        layers = [nn.Linear(channels[i - 1], channels[i]), nn.ReLU()]
        if batch_norm:
            layers.append(nn.BatchNorm1d(channels[i], momentum=0.1))
        stages.append(nn.Sequential(*layers))
    return nn.Sequential(*stages)


def _with_self_loops(edges: torch.Tensor, num_verts: int) -> torch.Tensor:
    """Undirected edges (E,2) -> directed both ways + self loops, (E',2)."""
    e = edges[edges[:, 0] != edges[:, 1]]
    both = torch.cat([e, e.flip(1)], dim=0).unique(dim=0)
    loops = torch.arange(num_verts)[:, None].repeat(1, 2)
    return torch.cat([both, loops], dim=0)


def edge_conv(msg_mlp: nn.Module, x: torch.Tensor, edges: torch.Tensor) -> torch.Tensor:
    """max-aggregated nn([x_i, x_j - x_i]) per target vertex i.

    `edges` is an undirected (E,2) list; self loops are (re)added, matching
    the reference's remove+add_self_loops on every call.
    """
    V = x.shape[0]
    e = _with_self_loops(edges, V)
    src, dst = e[:, 0], e[:, 1]              # message from j=src into i=dst
    msgs = msg_mlp(torch.cat([x[dst], x[src] - x[dst]], dim=1))
    out = torch.full((V, msgs.shape[1]), -torch.inf, dtype=msgs.dtype)
    out.index_reduce_(0, dst, msgs, "amax", include_self=False)
    return out


class GCUOracle(nn.Module):
    """basic_modules.py:165-177."""

    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.edge_conv_tpl = nn.Module()
        self.edge_conv_tpl.nn_pos = mlp([in_channels * 2, out_channels // 2, out_channels // 2])
        self.edge_conv_geo = nn.Module()
        self.edge_conv_geo.nn_pos = mlp([in_channels * 2, out_channels // 2, out_channels // 2])
        self.mlp = mlp([out_channels, out_channels])

    def forward(self, x, tpl_edges, geo_edges):
        x_tpl = edge_conv(self.edge_conv_tpl.nn_pos, x, tpl_edges)
        x_geo = edge_conv(self.edge_conv_geo.nn_pos, x, geo_edges)
        return self.mlp(torch.cat([x_tpl, x_geo], dim=1))


class GCUMotionOracle(nn.Module):
    """basic_modules.py:179-219: separate feature/position message MLPs."""

    def __init__(self, in_channels, out_channels, in_channel_pos=3, dim_pos_feat=16):
        super().__init__()
        for name in ("edge_conv_tpl", "edge_conv_geo"):
            m = nn.Module()
            m.nn_x = mlp([in_channels * 2, out_channels // 2, out_channels // 2])
            m.nn_pos = mlp([in_channel_pos * 2, dim_pos_feat, dim_pos_feat])
            setattr(self, name, m)
        self.mlp = mlp([out_channels + dim_pos_feat * 2, out_channels])

    def _conv(self, m, pos, x, edges):
        V = x.shape[0]
        e = _with_self_loops(edges, V)
        src, dst = e[:, 0], e[:, 1]
        mx = m.nn_x(torch.cat([x[dst], x[src] - x[dst]], dim=1))
        mp = m.nn_pos(torch.cat([pos[dst], pos[src] - pos[dst]], dim=1))
        msgs = torch.cat([mx, mp], dim=1)
        out = torch.full((V, msgs.shape[1]), -torch.inf, dtype=msgs.dtype)
        out.index_reduce_(0, dst, msgs, "amax", include_self=False)
        return out

    def forward(self, pos, x, tpl_edges, geo_edges):
        x_tpl = self._conv(self.edge_conv_tpl, pos, x, tpl_edges)
        x_geo = self._conv(self.edge_conv_geo, pos, x, geo_edges)
        return self.mlp(torch.cat([x_tpl, x_geo], dim=1))


class MeshEncoderOracle(nn.Module):
    """CorrNet mesh branch (corrnet.py:17-22,39-48), single sample."""

    def __init__(self, output_feature=64):
        super().__init__()
        self.vtx_gcu_1 = GCUOracle(3, 32)
        self.vtx_gcu_2 = GCUOracle(32, 64)
        self.vtx_gcu_3 = GCUOracle(64, 256)
        self.vtx_gcu_4 = GCUOracle(256, 512)
        self.vtx_mlp_glb = mlp([32 + 64 + 256 + 512, 1024])
        self.vtx_mlp = nn.Sequential(
            mlp([1024 + 3 + 32 + 64 + 256 + 512, 1024, 256]),
            nn.Linear(256, output_feature),
        )

    def forward(self, vtx, tpl_edges, geo_edges):
        x1 = self.vtx_gcu_1(vtx, tpl_edges, geo_edges)
        x2 = self.vtx_gcu_2(x1, tpl_edges, geo_edges)
        x3 = self.vtx_gcu_3(x2, tpl_edges, geo_edges)
        x4 = self.vtx_gcu_4(x3, tpl_edges, geo_edges)
        skips = torch.cat([x1, x2, x3, x4], dim=1)
        x5 = self.vtx_mlp_glb(skips)
        glb = x5.max(dim=0, keepdim=True)[0].expand(x5.shape[0], -1)
        x6 = torch.cat([glb, vtx, skips], dim=1)
        out = self.vtx_mlp(x6)
        return torch.nn.functional.normalize(out, dim=1)


class TemporalAttnOracle(nn.Module):
    """models/rignet.py:10-46: CLS-token single-block MHA, per-vertex rows.

    Input x: (N, T, C) motion tokens; output (N, output_size)."""

    def __init__(self, input_size=32, num_heads=2, hidden_size=64,
                 dim_feedforward=512, output_size=64):
        super().__init__()
        self.num_heads = num_heads
        self.w_qs = nn.Linear(input_size, hidden_size * num_heads, bias=False)
        self.w_ks = nn.Linear(input_size, hidden_size * num_heads, bias=False)
        self.w_vs = nn.Linear(input_size, hidden_size * num_heads, bias=False)
        self.w_o = nn.Linear(hidden_size * num_heads, hidden_size, bias=False)
        self.feedforward = mlp([hidden_size, dim_feedforward, output_size])
        self.cls_token = nn.Parameter(torch.randn(1, 1, input_size))

    def _split(self, X):
        # (N, S, H*D) -> (N*H, S, D), heads leading within the last axis
        N, S, _ = X.shape
        X = X.reshape(N, S, self.num_heads, -1).permute(0, 2, 1, 3)
        return X.reshape(N * self.num_heads, S, -1)

    def forward(self, x):
        N = x.shape[0]
        cls = self.cls_token.expand(N, -1, -1)
        seq = torch.cat([cls, x], dim=1)                          # (N, T+1, C)
        q, k, v = self._split(self.w_qs(seq)), self._split(self.w_ks(seq)), \
            self._split(self.w_vs(seq))
        attn = torch.softmax(torch.bmm(q, k.transpose(-2, -1)) /
                             (k.shape[-1] ** 0.5), dim=-1)
        res = torch.bmm(attn, v)                                  # (N*H, S, D)
        S = res.shape[1]
        res = res.reshape(N, self.num_heads, S, -1).permute(0, 2, 1, 3)
        res = res.reshape(N, S, -1)
        res = self.w_o(res)
        return self.feedforward(res[:, 0, :])


class GCNRigOracle(nn.Module):
    """models/rignet.py:49-67: 3x GCUMotion + global max + transform head.

    `width_scale` shrinks hidden widths proportionally (1.0 = reference),
    mirroring morig_tpu.nn.rignet.GCNRig for the trained head-to-head."""

    def __init__(self, chn_feature, chn_output, width_scale=1.0):
        super().__init__()
        w = lambda c: max(8, int(c * width_scale))
        self.gcu_1 = GCUMotionOracle(chn_feature, w(64), dim_pos_feat=16)
        self.gcu_2 = GCUMotionOracle(w(64), w(256), dim_pos_feat=16)
        self.gcu_3 = GCUMotionOracle(w(256), w(512), dim_pos_feat=16)
        self.mlp_glb = mlp([w(64) + w(256) + w(512), w(1024)])
        self.mlp_transform = nn.Sequential(
            mlp([w(1024) + 3 + chn_feature + w(64) + w(256) + w(512), w(1024), w(256)]),
            nn.Linear(w(256), chn_output),
        )

    def forward(self, pos, feature, tpl_edges, geo_edges):
        x1 = self.gcu_1(pos, feature, tpl_edges, geo_edges)
        x2 = self.gcu_2(pos, x1, tpl_edges, geo_edges)
        x3 = self.gcu_3(pos, x2, tpl_edges, geo_edges)
        skips = torch.cat([x1, x2, x3], dim=1)
        x4 = self.mlp_glb(skips)
        glb = x4.max(dim=0, keepdim=True)[0].expand(x4.shape[0], -1)
        return self.mlp_transform(torch.cat([glb, pos, feature, skips], dim=1))


class GCNDeformOracle(nn.Module):
    """models/deformnet.py:13-31 — note the reference's `mlp_tramsform`
    attribute misspelling, reproduced for state_dict fidelity."""

    def __init__(self, chn_in=4, chn_output=3):
        super().__init__()
        self.gcu_1 = GCUMotionOracle(chn_in, 128)
        self.gcu_2 = GCUMotionOracle(128, 256)
        self.gcu_3 = GCUMotionOracle(256, 512)
        self.mlp_glb = mlp([128 + 256 + 512, 1024])
        self.mlp_tramsform = nn.Sequential(
            mlp([1024 + 3 + chn_in + 128 + 256 + 512, 1024, 256]),
            nn.Linear(256, chn_output),
        )

    def forward(self, pos, feature, tpl_edges, geo_edges):
        x1 = self.gcu_1(pos, feature, tpl_edges, geo_edges)
        x2 = self.gcu_2(pos, x1, tpl_edges, geo_edges)
        x3 = self.gcu_3(pos, x2, tpl_edges, geo_edges)
        skips = torch.cat([x1, x2, x3], dim=1)
        x4 = self.mlp_glb(skips)
        glb = x4.max(dim=0, keepdim=True)[0].expand(x4.shape[0], -1)
        return self.mlp_tramsform(torch.cat([glb, pos, feature, skips], dim=1))


class SkinNetInnerOracle(nn.Module):
    """models/rignet.py:136-182, use_Dg=use_Lf=False single-sample form."""

    def __init__(self, nearest_bone=5, motion_dim=32, width_scale=1.0):
        super().__init__()
        self.K = nearest_bone
        w = lambda c: max(8, int(c * width_scale))
        input_dim = 3 + nearest_bone * 6
        self.gcu1 = GCUMotionOracle(motion_dim, w(256), in_channel_pos=input_dim,
                                    dim_pos_feat=64)
        self.gcu2 = GCUMotionOracle(w(256), w(256), in_channel_pos=input_dim,
                                    dim_pos_feat=64)
        self.gcu3 = GCUMotionOracle(w(256), w(256), in_channel_pos=input_dim,
                                    dim_pos_feat=64)
        self.multi_layer_tranform2 = mlp([w(256), w(512), w(1024)])  # [sic]
        self.cls_branch = nn.Sequential(mlp([w(1024) + w(256), w(1024), w(512)]),
                                        nn.Linear(w(512), nearest_bone))

    def forward(self, pos, skin_input, motion, tpl_edges, geo_edges):
        import numpy as np

        samples = skin_input
        keep = np.arange(samples.shape[1]) % 8 != 7          # rignet.py:169-171
        samples = samples[:, keep]
        keep = np.arange(samples.shape[1]) % 7 != 6
        samples = samples[:, keep][:, : 6 * self.K]
        raw = torch.cat([pos, samples], dim=1)
        x1 = self.gcu1(raw, motion, tpl_edges, geo_edges)
        xg = self.multi_layer_tranform2(x1).max(dim=0, keepdim=True)[0]
        x2 = self.gcu2(raw, x1, tpl_edges, geo_edges)
        x3 = self.gcu3(raw, x2, tpl_edges, geo_edges)
        xg = xg.expand(x3.shape[0], -1)
        return self.cls_branch(torch.cat([x3, xg], dim=1))


def info_nce_oracle(vtx_feature, pts_feature, corr_v2p, corr_p2v, tau):
    """Per-sample symmetric infoNCE (customized_losses.py:107-134).

    Lists of per-sample tensors; returns sum of per-direction mean CEs
    averaged over samples.
    """
    ce = nn.CrossEntropyLoss(reduction="none")
    loss = 0.0
    B = len(vtx_feature)
    for vf, pf, v2p, p2v in zip(vtx_feature, pts_feature, corr_v2p, corr_p2v):
        if len(v2p) == 0:
            continue
        anchor = vf[v2p[:, 0]]
        loss += ce(anchor @ pf.T / tau, v2p[:, 1]).mean()
        if len(p2v) == 0:
            continue
        anchor = pf[p2v[:, 0]]
        loss += ce(anchor @ vf.T / tau, p2v[:, 1]).mean()
    return loss / B


def randomize_bn_stats(module: nn.Module, gen: torch.Generator) -> None:
    """Give every BN layer non-trivial running stats and affine params so an
    eval-mode parity test actually exercises the statistics mapping."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.normal_(0.0, 0.2, generator=gen)
