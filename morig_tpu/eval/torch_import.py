"""Import reference PyTorch checkpoints into morig_tpu flax params.

The reference trains torch modules whose state_dict key layout is fixed by
models/corrnet.py:17-35 and models/basic_modules.py:31-36,142-219:

  * MLP([c0, c1, ..., cn]) is Seq(Seq(Lin, ReLU, BN1d), ...) — stage i keys
    `{p}.{i}.0.weight/bias` (Linear) and `{p}.{i}.2.weight/bias/
    running_mean/running_var` (BatchNorm1d).
  * EdgeConv stores its message MLP as `nn_pos` (basic_modules.py:144);
    EdgeConvMotion as `nn_x` + `nn_pos` (basic_modules.py:179-185).
  * GCU/GCUMotion hold `edge_conv_tpl`, `edge_conv_geo`, `mlp`
    (basic_modules.py:165-177, 205-219).
  * Heads are Seq(MLP, Lin): `{p}.0.*` = MLP, `{p}.1.weight/bias` = final
    Linear (corrnet.py:22,33,35).
  * PyG PointConv stores the SA message MLP as `conv.local_nn`
    (basic_modules.py:69); GlobalSA/FP store theirs as `nn`.

This module maps those tensors onto the morig_tpu module tree in its
"batch"-norm parity mode (nn.mlp.set_default_norm("batch")).  The one
non-trivial mapping is the decomposed first edge layer (nn/gcu.py:9-21):
the reference's first Linear acts on [x_i ; x_j - x_i] with weight
W = [W1 | W2], which equals (W1 - W2) x_i + W2 x_j + b, so

    lin_self.kernel = (W1 - W2)^T,  lin_self.bias = b,  lin_nbr.kernel = W2^T.

All functions take `sd`: a flat dict of numpy arrays (use
`state_dict_to_numpy` on a torch state_dict / loaded checkpoint).
Each returns (params, batch_stats) nested dicts ready to splice into a flax
variable tree.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def state_dict_to_numpy(sd: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Convert a torch state_dict (or dict of tensors/arrays) to numpy."""
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out



def _j(prefix: str, name: str) -> str:
    """Join torch key-path segments, tolerating empty prefixes."""
    return prefix + "." + name if prefix else name


def _lin(sd, prefix):
    return dict(
        kernel=np.ascontiguousarray(sd[f"{prefix}.weight"].T.astype(np.float32)),
        bias=sd[f"{prefix}.bias"].astype(np.float32),
    )


def _bn(sd, prefix):
    params = dict(scale=sd[f"{prefix}.weight"].astype(np.float32),
                  bias=sd[f"{prefix}.bias"].astype(np.float32))
    stats = dict(mean=sd[f"{prefix}.running_mean"].astype(np.float32),
                 var=sd[f"{prefix}.running_var"].astype(np.float32))
    return params, stats


def _num_stages(sd, prefix: str) -> int:
    n = 0
    while _j(prefix, f"{n}.0.weight") in sd:
        n += 1
    if n == 0:
        raise KeyError(f"no MLP stages under '{prefix}'")
    return n


def import_mlp(sd, prefix: str):
    """Reference MLP -> flax nn.mlp.MLP (batch mode): dense_i + bn_i."""
    params: dict = {}
    stats: dict = {}
    for i in range(_num_stages(sd, prefix)):
        params[f"dense_{i}"] = _lin(sd, _j(prefix, f"{i}.0"))
        if _j(prefix, f"{i}.2.weight") in sd:
            p, s = _bn(sd, _j(prefix, f"{i}.2"))
            params[f"bn_{i}"] = p
            stats[f"bn_{i}"] = s
    return params, stats


def import_edge_mlp(sd, prefix: str):
    """Reference edge-message MLP -> flax nn.gcu.EdgeMLP (batch mode).

    Stage 0 splits into the decomposed lin_self/lin_nbr pair; later stages map
    to dense_i; every BN maps to norm_i/bn.
    """
    n = _num_stages(sd, prefix)
    W = sd[_j(prefix, "0.0.weight")].astype(np.float32)          # (H, 2C)
    b = sd[_j(prefix, "0.0.bias")].astype(np.float32)
    C = W.shape[1] // 2
    W1, W2 = W[:, :C], W[:, C:]
    params: dict = {
        "lin_self": dict(kernel=np.ascontiguousarray((W1 - W2).T), bias=b),
        "lin_nbr": dict(kernel=np.ascontiguousarray(W2.T)),
    }
    stats: dict = {}
    for i in range(n):
        if i > 0:
            params[f"dense_{i}"] = _lin(sd, _j(prefix, f"{i}.0"))
        if _j(prefix, f"{i}.2.weight") in sd:
            p, s = _bn(sd, _j(prefix, f"{i}.2"))
            params[f"norm_{i}"] = {"bn": p}
            stats[f"norm_{i}"] = {"bn": s}
    return params, stats


def import_edge_conv(sd, prefix: str):
    """Reference EdgeConv -> flax EdgeConv (its one EdgeMLP is named nn_pos)."""
    p, s = import_edge_mlp(sd, _j(prefix, "nn_pos"))
    return {"nn_pos": p}, {"nn_pos": s}


def import_edge_conv_motion(sd, prefix: str):
    px, sx = import_edge_mlp(sd, _j(prefix, "nn_x"))
    pp, sp = import_edge_mlp(sd, _j(prefix, "nn_pos"))
    return {"nn_x": px, "nn_pos": pp}, {"nn_x": sx, "nn_pos": sp}


def _import_gcu_like(sd, prefix: str, conv_importer):
    params: dict = {}
    stats: dict = {}
    for name in ("edge_conv_tpl", "edge_conv_geo"):
        p, s = conv_importer(sd, _j(prefix, name))
        params[name], stats[name] = p, s
    p, s = import_mlp(sd, _j(prefix, "mlp"))
    params["mlp"], stats["mlp"] = p, s
    return params, stats


def import_gcu(sd, prefix: str):
    """Reference GCU (basic_modules.py:165-177) -> flax GCU."""
    return _import_gcu_like(sd, prefix, import_edge_conv)


def import_gcu_motion(sd, prefix: str):
    """Reference GCUMotion (basic_modules.py:205-219) -> flax GCUMotion."""
    return _import_gcu_like(sd, prefix, import_edge_conv_motion)


def import_mlp_head(sd, prefix: str):
    """Reference Seq(MLP, Lin) head -> flax MLPHead {mlp, out}."""
    p, s = import_mlp(sd, _j(prefix, "0"))
    return {"mlp": p, "out": _lin(sd, _j(prefix, "1"))}, {"mlp": s}


def import_sa_module(sd, prefix: str):
    """Reference SAModule (PointConv local_nn) -> flax SAModule {conv}."""
    p, s = import_mlp(sd, _j(prefix, "conv.local_nn"))
    return {"conv": p}, {"conv": s}


def import_nn_module(sd, prefix: str):
    """GlobalSAModule / FPModule (their MLP is attribute `nn`) -> {nn}."""
    p, s = import_mlp(sd, _j(prefix, "nn"))
    return {"nn": p}, {"nn": s}


def import_mesh_encoder(sd, prefix: str = ""):
    """CorrNet mesh branch (corrnet.py:17-22) -> flax MeshEncoder."""
    pre = f"{prefix}." if prefix else ""
    params: dict = {}
    stats: dict = {}
    for i in range(1, 5):
        p, s = import_gcu(sd, f"{pre}vtx_gcu_{i}")
        params[f"vtx_gcu_{i}"], stats[f"vtx_gcu_{i}"] = p, s
    p, s = import_mlp(sd, f"{pre}vtx_mlp_glb")
    params["vtx_mlp_glb"], stats["vtx_mlp_glb"] = p, s
    p, s = import_mlp_head(sd, f"{pre}vtx_mlp")
    params["vtx_mlp"], stats["vtx_mlp"] = p, s
    return params, stats


def import_point_encoder(sd, prefix: str = ""):
    """CorrNet point branch (corrnet.py:24-33) -> flax PointEncoder."""
    pre = f"{prefix}." if prefix else ""
    params: dict = {}
    stats: dict = {}
    for flax_name, torch_name, imp in (
        ("sa1", "pts_sa1_module", import_sa_module),
        ("sa2", "pts_sa2_module", import_sa_module),
        ("sa3", "pts_sa3_module", import_sa_module),
        ("sa4", "pts_sa4_module", import_nn_module),
        ("fp4", "pts_fp4_module", import_nn_module),
        ("fp3", "pts_fp3_module", import_nn_module),
        ("fp2", "pts_fp2_module", import_nn_module),
        ("fp1", "pts_fp1_module", import_nn_module),
    ):
        p, s = imp(sd, f"{pre}{torch_name}")
        params[flax_name], stats[flax_name] = p, s
    p, s = import_mlp_head(sd, f"{pre}pts_mlp")
    params["pts_mlp"], stats["pts_mlp"] = p, s
    return params, stats


def import_temporal_attn(sd, prefix: str):
    """Reference TemporalAttn (models/rignet.py:10-46) -> flax TemporalAttn.

    w_qs/w_ks/w_vs/w_o are bias-free Linears; cls_token is a (1,1,C)
    parameter -> (C,); feedforward is a 2-stage reference MLP.  The reference
    splits the last axis H*D with H leading (transpose_qkv, rignet.py:22-27),
    which matches the flax reshape (..., H, D) exactly.
    """
    pre = f"{prefix}." if prefix else ""
    params: dict = {
        "cls_token": sd[f"{pre}cls_token"].reshape(-1).astype(np.float32),
    }
    for name in ("w_qs", "w_ks", "w_vs", "w_o"):
        params[name] = dict(kernel=np.ascontiguousarray(
            sd[f"{pre}{name}.weight"].T.astype(np.float32)))
    p, s = import_mlp(sd, f"{pre}feedforward")
    params["feedforward"] = p
    return params, {"feedforward": s}


def import_gcn_rig(sd, prefix: str):
    """Reference GCNRig (rignet.py:49-67) -> flax GCNRig: 3 GCUMotion +
    mlp_glb + Seq(MLP, Lin) transform head."""
    pre = f"{prefix}." if prefix else ""
    params: dict = {}
    stats: dict = {}
    for i in (1, 2, 3):
        p, s = import_gcu_motion(sd, f"{pre}gcu_{i}")
        params[f"gcu_{i}"], stats[f"gcu_{i}"] = p, s
    p, s = import_mlp(sd, f"{pre}mlp_glb")
    params["mlp_glb"], stats["mlp_glb"] = p, s
    p, s = import_mlp_head(sd, f"{pre}mlp_transform")
    params["mlp_transform"], stats["mlp_transform"] = p, s
    return params, stats


def import_gcn_deform(sd, prefix: str):
    """Reference GCNDeform (deformnet.py:13-31) -> flax GCNDeform.  Identical
    structure to GCNRig except the reference misspells the head attribute
    `mlp_tramsform` (deformnet.py:20) — mapped to flax `mlp_transform`."""
    pre = f"{prefix}." if prefix else ""
    params: dict = {}
    stats: dict = {}
    for i in (1, 2, 3):
        p, s = import_gcu_motion(sd, f"{pre}gcu_{i}")
        params[f"gcu_{i}"], stats[f"gcu_{i}"] = p, s
    p, s = import_mlp(sd, f"{pre}mlp_glb")
    params["mlp_glb"], stats["mlp_glb"] = p, s
    p, s = import_mlp_head(sd, f"{pre}mlp_tramsform")
    params["mlp_transform"], stats["mlp_transform"] = p, s
    return params, stats


def import_deformnet(sd, prefix: str = ""):
    """Reference DeformNet state_dict (models/deformnet.py:34-99) -> flax
    DeformNet: internal CorrNet `corr_extractor` + `completing` GCNDeform."""
    pre = f"{prefix}." if prefix else ""
    cp, cs = import_corrnet(sd, f"{pre}corr_extractor")
    gp, gs = import_gcn_deform(sd, f"{pre}completing")
    return ({"corr_extractor": cp, "completing": gp},
            {"corr_extractor": cs, "completing": gs})


def _import_motion_net(sd, prefix: str):
    """The shared motionNet + `aggragator` [sic] pair of every rigging net
    (rignet.py:75-77,190-191) -> the flax MotionAggregator subtree."""
    pre = f"{prefix}." if prefix else ""
    mp, ms = import_gcn_rig(sd, f"{pre}motionNet")
    ap, as_ = import_temporal_attn(sd, f"{pre}aggragator")
    return ({"motionNet": mp, "aggregator": ap},
            {"motionNet": ms, "aggregator": as_})


def import_jointnet(sd, prefix: str = ""):
    """Reference JointNetMotion (rignet.py:70-100) -> flax JointNetMotion
    (attn aggregation)."""
    pre = f"{prefix}." if prefix else ""
    mp, ms = _import_motion_net(sd, prefix)
    jp, js = import_gcn_rig(sd, f"{pre}jointnet")
    return {"motion": mp, "jointnet": jp}, {"motion": ms, "jointnet": js}


def import_masknet(sd, prefix: str = ""):
    """Reference MaskNetMotion (rignet.py:103-133) -> flax MaskNetMotion."""
    pre = f"{prefix}." if prefix else ""
    mp, ms = _import_motion_net(sd, prefix)
    kp, ks = import_gcn_rig(sd, f"{pre}masknet")
    return {"motion": mp, "masknet": kp}, {"motion": ms, "masknet": ks}


def import_skinmotion(sd, prefix: str = ""):
    """Reference SkinMotion (rignet.py:185-205) -> flax SkinMotion.

    skinNet children: gcu1/gcu2/gcu3 (descriptor-as-position GCUMotion),
    `multi_layer_tranform2` [sic] (rignet.py:155) -> multi_layer_transform2,
    cls_branch Seq(MLP, Lin)."""
    pre = f"{prefix}." if prefix else ""
    mp, ms = _import_motion_net(sd, prefix)
    params: dict = {}
    stats: dict = {}
    for i in (1, 2, 3):
        p, s = import_gcu_motion(sd, f"{pre}skinNet.gcu{i}")
        params[f"gcu{i}"], stats[f"gcu{i}"] = p, s
    p, s = import_mlp(sd, f"{pre}skinNet.multi_layer_tranform2")
    params["multi_layer_transform2"], stats["multi_layer_transform2"] = p, s
    p, s = import_mlp_head(sd, f"{pre}skinNet.cls_branch")
    params["cls_branch"], stats["cls_branch"] = p, s
    return ({"motion": mp, "skinNet": params},
            {"motion": ms, "skinNet": stats})


def _import_shape_encoder(sd, prefix: str):
    """RigNet-heritage ShapeEncoder (bonenet.py:58-72 / rootnet.py:16-31):
    3 GCU + mlp_glb."""
    pre = f"{prefix}." if prefix else ""
    params: dict = {}
    stats: dict = {}
    for i in (1, 2, 3):
        p, s = import_gcu(sd, f"{pre}gcu_{i}")
        params[f"gcu_{i}"], stats[f"gcu_{i}"] = p, s
    p, s = import_mlp(sd, f"{pre}mlp_glb")
    params["mlp_glb"], stats["mlp_glb"] = p, s
    return params, stats


def import_bonenet(sd, prefix: str = ""):
    """Reference PairCls (bonenet.py:99-125) -> flax BoneNet.

    Torch children: shape_encoder, joint_encoder.sa{1,2,3}_module_joints,
    expand_joint_feature = Seq(MLP) (inner MLP at Sequential index 0),
    mix_transform = Seq(MLP, Dropout, Linear) (Linear at index 2) -> flax
    mix_transform MLP + `out` Dense."""
    pre = f"{prefix}." if prefix else ""
    params: dict = {}
    stats: dict = {}
    params["shape_encoder"], stats["shape_encoder"] = _import_shape_encoder(
        sd, f"{pre}shape_encoder")
    jp: dict = {}
    js: dict = {}
    for flax_name, torch_name, imp in (
        ("sa1", "sa1_module_joints", import_sa_module),
        ("sa2", "sa2_module_joints", import_sa_module),
        ("sa3", "sa3_module_joints", import_nn_module),
    ):
        p, s = imp(sd, f"{pre}joint_encoder.{torch_name}")
        jp[flax_name], js[flax_name] = p, s
    params["joint_encoder"], stats["joint_encoder"] = jp, js
    p, s = import_mlp(sd, f"{pre}expand_joint_feature.0")
    params["expand_joint_feature"], stats["expand_joint_feature"] = p, s
    p, s = import_mlp(sd, f"{pre}mix_transform.0")
    params["mix_transform"], stats["mix_transform"] = p, s
    params["out"] = _lin(sd, f"{pre}mix_transform.2")
    return params, stats


def import_rootnet(sd, prefix: str = ""):
    """Reference ROOTNET (rootnet.py:64-93) -> flax RootNet.

    Torch joint_encoder children sa{1,2,3}_joint / fp{1,2,3}_joint flatten to
    top-level flax names sa1..fp1; back_layers = Seq(MLP, Lin) -> MLPHead."""
    pre = f"{prefix}." if prefix else ""
    params: dict = {}
    stats: dict = {}
    params["shape_encoder"], stats["shape_encoder"] = _import_shape_encoder(
        sd, f"{pre}shape_encoder")
    for flax_name, torch_name, imp in (
        ("sa1", "sa1_joint", import_sa_module),
        ("sa2", "sa2_joint", import_sa_module),
        ("sa3", "sa3_joint", import_nn_module),
        ("fp3", "fp3_joint", import_nn_module),
        ("fp2", "fp2_joint", import_nn_module),
        ("fp1", "fp1_joint", import_nn_module),
    ):
        p, s = imp(sd, f"{pre}joint_encoder.{torch_name}")
        params[flax_name], stats[flax_name] = p, s
    p, s = import_mlp_head(sd, f"{pre}back_layers")
    params["back_layers"], stats["back_layers"] = p, s
    return params, stats


def import_corrnet(sd, prefix: str = ""):
    """Full reference CorrNet state_dict -> flax CorrNet (params, batch_stats).

    Covers mesh branch, point branch, vismask head (corrnet.py:35), and the
    learnable temperature (corrnet.py:15, a (1,) tensor -> scalar).
    """
    pre = f"{prefix}." if prefix else ""
    mp, ms = import_mesh_encoder(sd, prefix)
    pp, ps = import_point_encoder(sd, prefix)
    params: dict = {"mesh_enc": mp, "pts_enc": pp}
    stats: dict = {"mesh_enc": ms, "pts_enc": ps}
    vp, vs = import_mlp_head(sd, f"{pre}lin_vismask")
    params["lin_vismask"], stats["lin_vismask"] = vp, vs
    params["temperature"] = np.asarray(sd[f"{pre}temprature"], np.float32).reshape(())
    return params, stats
