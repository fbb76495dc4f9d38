"""Results-folder batch evaluation workflows (eval_rigging.py:48-131 /
eval_tracking.py:213-235 equivalents)."""
import numpy as np

from morig_tpu.eval.folder_eval import eval_rig_folder, eval_tracking_folder
from morig_tpu.geometry import skeleton as sk


def _toy_rig(jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.array([[0, 0, 0], [0, 0.3, 0], [0.2, 0.5, 0], [-0.2, 0.5, 0]],
                   float)
    pos = pos + jitter * rng.normal(size=pos.shape)
    skins = np.abs(rng.normal(size=(20, 4)))
    skins /= skins.sum(1, keepdims=True)
    return sk.Rig(names=["a", "b", "c", "d"], pos=pos,
                  parents=np.array([-1, 0, 1, 1]), skins=skins)


def test_eval_rig_folder_identical(tmp_path, capsys):
    res = tmp_path / "res"
    gt = tmp_path / "gt"
    res.mkdir()
    gt.mkdir()
    for name in ("m1", "m2"):
        rig = _toy_rig(seed=hash(name) % 100)
        rig.save(str(res / f"{name}_rig.txt"))
        rig.save(str(gt / f"{name}_rig.txt"))
    out = eval_rig_folder(str(res), str(gt))
    assert out["mean"]["joint_IoU"] == 1.0
    assert out["mean"]["joint_precision"] == 1.0
    assert out["mean"]["chamfer_j2j"] < 1e-6
    assert out["mean"]["skin_L1"] < 1e-3     # 4-decimal file round-trip
    assert (res / "rig_eval.npz").exists()
    assert "Joint IoU 100.000 %" in capsys.readouterr().out


def test_eval_rig_folder_perturbed(tmp_path):
    res = tmp_path / "res"
    gt = tmp_path / "gt"
    res.mkdir()
    gt.mkdir()
    _toy_rig(jitter=0.5, seed=1).save(str(res / "m_rig.txt"))
    _toy_rig(seed=1).save(str(gt / "m_rig.txt"))
    out = eval_rig_folder(str(res), str(gt), write_npz=False)
    assert out["mean"]["joint_IoU"] < 1.0
    assert out["mean"]["chamfer_j2j"] > 0.01


def test_eval_tracking_folder(tmp_path):
    res = tmp_path / "res"
    gt = tmp_path / "gt"
    res.mkdir()
    gt.mkdir()
    rng = np.random.default_rng(0)
    V, T = 30, 6
    gt_traj = rng.normal(size=(V, T, 3)).astype(np.float32)
    vis = (rng.random((V, T)) > 0.3).astype(np.float32)
    np.save(gt / "m_vtx_traj.npy", gt_traj)
    np.save(gt / "m_vismask.npy", vis)
    pred = gt_traj[:, 1:, :] + 0.01     # constant offset -> error 0.01*sqrt(3)
    np.savez(res / "m_tracking.npz", pred_vtx_traj=pred)
    out = eval_tracking_folder(str(res), str(gt))
    expect = 0.01 * np.sqrt(3.0)
    assert abs(out["mean"]["full_flow_error"] - expect) < 1e-5
    assert abs(out["mean"]["vis_flow_error"] - expect) < 1e-5
    z = np.load(res / "m_flow_errors.npz")
    assert z["full_flow_error"].shape == (T - 1,)
