"""Reported-metric parity vs the UNMODIFIED reference eval stack.

test_torch_parity.py establishes tensor-level parity of the generate path at
5e-4; this module closes the remaining chain to the REPORTED metric: identical
prediction/GT corner sets fed through OUR eval (eval/ap.py + ops/boxes.py +
ops/nms.py) and through the reference's (net_utils/eval_det.py +
net_utils/ap_helper.py + net_utils/box_util.py, imported read-only from
/root/reference) must produce the same per-class AP / mAP / AR to ~1e-6, and
identical end_points must survive parse_predictions with the same pred_mask
under all three NMS modes plus remove_far_box.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref_eval(tmp_path_factory):
    """Import the reference eval stack (CPU-importable, viz deps stubbed)."""
    workdir = tmp_path_factory.mktemp("refeval")
    os.makedirs(workdir / "datasets", exist_ok=True)
    old_cwd = os.getcwd()
    os.chdir(workdir)  # Dataset_Config mkdirs relative paths
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from measure_torch_baseline import stub_viz_deps

    sys.path.insert(0, REFERENCE)
    stub_viz_deps()

    import net_utils.ap_helper as ref_ap_helper
    import net_utils.eval_det as ref_eval_det
    from configs.dataset_config import Dataset_Config

    dc = Dataset_Config("virtualhome")
    os.chdir(old_cwd)
    return ref_ap_helper, ref_eval_det, dc


def _random_boxes(rng, n, center_scale=3.0):
    centers = rng.uniform(-center_scale, center_scale, size=(n, 3))
    sizes = rng.uniform(0.4, 2.0, size=(n, 3))
    headings = rng.uniform(-np.pi, np.pi, size=n)
    return centers, sizes, headings


def _corners(centers, sizes, headings):
    from pose2room_tpu.ops.boxes import box_corners_from_params

    return np.asarray(
        box_corners_from_params(centers, sizes, headings, xp=np)
    )


def _make_det_scenario(rng, n_scans=6, n_cls=5):
    """pred_all/gt_all in the {img_id: [(cls, bbox, score)]} format both
    stacks consume: GT boxes + jittered TP candidates + random FPs."""
    pred_all, gt_all = {}, {}
    for img in range(n_scans):
        n_gt = rng.randint(1, 5)
        c, s, h = _random_boxes(rng, n_gt)
        gt_corners = _corners(c, s, h)
        cls_gt = rng.randint(0, n_cls, size=n_gt)
        gt_all[img] = [(int(cls_gt[j]), gt_corners[j]) for j in range(n_gt)]

        preds = []
        # jittered true positives (some below, some above the IoU threshold)
        for j in range(n_gt):
            jitter = rng.uniform(0.02, 0.6)
            cj = c[j] + rng.randn(3) * jitter
            sj = s[j] * rng.uniform(0.8, 1.2, size=3)
            hj = h[j] + rng.randn() * 0.1
            box = _corners(cj[None], sj[None], np.array([hj]))[0]
            preds.append((int(cls_gt[j]), box, float(rng.rand())))
        # false positives, sometimes of a class with no GT in this scan
        for _ in range(rng.randint(0, 4)):
            cf, sf, hf = _random_boxes(rng, 1)
            box = _corners(cf, sf, hf)[0]
            preds.append((int(rng.randint(0, n_cls)), box, float(rng.rand())))
        pred_all[img] = preds
    return pred_all, gt_all


@pytest.mark.parametrize("ovthresh", [0.25, 0.5])
def test_eval_det_parity(ref_eval, ovthresh):
    _, ref_eval_det, _ = ref_eval
    from pose2room_tpu.eval.ap import eval_det

    rng = np.random.RandomState(7)
    pred_all, gt_all = _make_det_scenario(rng)

    rec_o, prec_o, ap_o = eval_det(pred_all, gt_all, ovthresh=ovthresh)
    rec_r, prec_r, ap_r = ref_eval_det.eval_det_multiprocessing_wo_mesh(
        pred_all, gt_all, ovthresh=ovthresh,
        get_iou_func=ref_eval_det.get_iou_obb,
    )

    assert set(ap_o.keys()) == set(ap_r.keys())
    for cls in ap_r:
        np.testing.assert_allclose(ap_o[cls], ap_r[cls], atol=1e-6,
                                   err_msg=f"AP mismatch for class {cls}")
        np.testing.assert_allclose(rec_o[cls], rec_r[cls], atol=1e-6)
        np.testing.assert_allclose(prec_o[cls], prec_r[cls], atol=1e-6)


def test_ap_calculator_parity(ref_eval):
    ref_ap_helper, _, dc = ref_eval
    from pose2room_tpu.eval.ap import APCalculator

    rng = np.random.RandomState(11)
    pred_all, gt_all = _make_det_scenario(rng, n_scans=8, n_cls=6)
    class2type = {i: f"cls{i}" for i in range(6)}

    ours = APCalculator(0.25, class2type)
    ref = ref_ap_helper.APCalculator(0.25, class2type)
    # feed scan-by-scan in the same order
    for img in sorted(pred_all):
        ours.step([pred_all[img]], [gt_all[img]])
        # reference step expects .item()-able cls labels; ints work
        ref.step([pred_all[img]], [gt_all[img]])

    m_ours = ours.compute_metrics()
    m_ref = ref.compute_metrics()
    common = set(m_ours) & set(m_ref)
    assert "mAP" in common and "AR" in common
    for k in common:
        np.testing.assert_allclose(
            float(m_ours[k]), float(m_ref[k]), atol=1e-6, err_msg=k
        )


def _make_end_points(rng, B=2, K=24, C=22, n_frames=60):
    center = rng.uniform(-2.5, 2.5, size=(B, K, 3)).astype(np.float32)
    size_log = np.log(rng.uniform(0.3, 2.0, size=(B, K, 3))).astype(np.float32)
    # a few degenerate boxes to exercise the remove_far_box size gate
    size_log[:, 0] = np.log(0.005)
    size_log[:, 1] = np.log(11.0)
    heading = rng.uniform(-np.pi, np.pi, size=(B, K)).astype(np.float32)
    heading_sincos = np.stack([np.sin(heading), np.cos(heading)], -1)
    objectness = rng.randn(B, K, 2).astype(np.float32)
    sem_cls = rng.randn(B, K, C).astype(np.float32)
    # hip trajectory passing near a subset of the proposal centers
    joints = rng.randn(B, n_frames, 53, 3).astype(np.float32) * 0.05
    for i in range(B):
        ks = rng.choice(K, size=K // 2, replace=False)
        joints[i, : len(ks), 0, :] += center[i, ks]
    end_points = {
        "center": center,
        "size": size_log,
        "heading": heading_sincos.astype(np.float32),
        "objectness_scores": objectness,
        "sem_cls_scores": sem_cls,
    }
    gt_data = {"input_joints": joints}
    return end_points, gt_data


@pytest.mark.parametrize(
    "use_3d_nms,cls_nms,remove_far_box",
    [
        (False, False, True),   # 2D BEV NMS
        (True, False, True),    # 3D NMS
        (True, True, True),     # 3D per-class NMS
        (True, False, False),   # no far-box pruning
    ],
)
def test_parse_predictions_parity(ref_eval, use_3d_nms, cls_nms, remove_far_box):
    ref_ap_helper, _, dc = ref_eval
    from pose2room_tpu.eval.parse import assembly_pred_map_cls, parse_predictions

    rng = np.random.RandomState(3 + int(use_3d_nms) + 2 * int(cls_nms))
    end_points, gt_data = _make_end_points(rng)

    config = {
        "dataset_config": dc,
        "remove_far_box": remove_far_box,
        "use_3d_nms": use_3d_nms,
        "cls_nms": cls_nms,
        "nms_iou": 0.10,
        "use_old_type_nms": False,
        "conf_thresh": 0.05,
        "per_class_proposal": True,
        "sample_cls": False,
    }

    eval_o, parsed_o = parse_predictions(end_points, gt_data, config)
    eval_o = assembly_pred_map_cls(eval_o, parsed_o, config)

    t_end = {k: torch.from_numpy(v) for k, v in end_points.items()}
    t_gt = {"input_joints": torch.from_numpy(gt_data["input_joints"])}
    eval_r, parsed_r = ref_ap_helper.parse_predictions(t_end, t_gt, config)
    eval_r = ref_ap_helper.assembly_pred_map_cls(eval_r, parsed_r, config)

    np.testing.assert_array_equal(eval_o["pred_mask"], eval_r["pred_mask"])
    np.testing.assert_allclose(
        parsed_o["pred_corners_3d"], parsed_r["pred_corners_3d"], atol=2e-5
    )
    np.testing.assert_allclose(parsed_o["obj_prob"], parsed_r["obj_prob"], atol=1e-6)
    np.testing.assert_allclose(
        parsed_o["sem_cls_probs"], parsed_r["sem_cls_probs"], atol=1e-6
    )
    np.testing.assert_array_equal(parsed_o["pred_sem_cls"], parsed_r["pred_sem_cls"])

    ours_map = eval_o["batch_pred_map_cls"]
    ref_map = eval_r["batch_pred_map_cls"]
    assert len(ours_map) == len(ref_map)
    for lo, lr in zip(ours_map, ref_map):
        assert len(lo) == len(lr)
        for (co, bo, so), (cr, br, sr) in zip(lo, lr):
            assert co == cr
            np.testing.assert_allclose(bo, br, atol=2e-5)
            np.testing.assert_allclose(so, sr, atol=1e-6)


def test_parse_groundtruths_parity(ref_eval):
    ref_ap_helper, _, dc = ref_eval
    from pose2room_tpu.eval.parse import assembly_gt_map_cls, parse_groundtruths

    rng = np.random.RandomState(19)
    B, M = 3, 10
    center = rng.uniform(-3, 3, size=(B, M, 3)).astype(np.float32)
    size_log = np.log(rng.uniform(0.3, 2.0, size=(B, M, 3))).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, size=(B, M)).astype(np.float32)
    sincos = np.stack([np.sin(heading), np.cos(heading)], -1).astype(np.float32)
    mask = (rng.rand(B, M) > 0.4).astype(np.float32)
    sem = rng.randint(0, dc.num_class, size=(B, M)).astype(np.int64)
    gt = {
        "center_label": center,
        "size": size_log,
        "heading": sincos,
        "box_label_mask": mask,
        "sem_cls_label": sem,
    }

    parsed_o = parse_groundtruths(gt)
    gt_map_o = assembly_gt_map_cls(parsed_o)

    t_gt = {k: torch.from_numpy(v) for k, v in gt.items()}
    parsed_r = ref_ap_helper.parse_groundtruths(t_gt, {"dataset_config": dc})
    gt_map_r = ref_ap_helper.assembly_gt_map_cls(parsed_r)

    assert len(gt_map_o) == len(gt_map_r)
    for lo, lr in zip(gt_map_o, gt_map_r):
        assert len(lo) == len(lr)
        for (co, bo), (cr, br) in zip(lo, lr):
            assert co == int(cr)
            np.testing.assert_allclose(bo, br, atol=2e-5)


def test_end_to_end_metric_parity(ref_eval):
    """The full chain on one synthetic batch: identical end_points ->
    (each stack's own parse + NMS + assembly + AP) -> identical mAP/AR."""
    ref_ap_helper, _, dc = ref_eval
    from pose2room_tpu.eval.ap import APCalculator
    from pose2room_tpu.eval.parse import (
        assembly_gt_map_cls,
        assembly_pred_map_cls,
        parse_groundtruths,
        parse_predictions,
    )

    rng = np.random.RandomState(23)
    end_points, gt_data = _make_end_points(rng, B=4, K=32)
    B, M = 4, 10
    center = rng.uniform(-3, 3, size=(B, M, 3)).astype(np.float32)
    size_log = np.log(rng.uniform(0.3, 2.0, size=(B, M, 3))).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, size=(B, M)).astype(np.float32)
    gt_data.update(
        center_label=center,
        size=size_log,
        heading=np.stack([np.sin(heading), np.cos(heading)], -1).astype(np.float32),
        box_label_mask=(rng.rand(B, M) > 0.5).astype(np.float32),
        sem_cls_label=rng.randint(0, dc.num_class, size=(B, M)).astype(np.int64),
    )
    config = {
        "dataset_config": dc, "remove_far_box": True, "use_3d_nms": True,
        "cls_nms": False, "nms_iou": 0.10, "use_old_type_nms": False,
        "conf_thresh": 0.05, "per_class_proposal": True, "sample_cls": False,
    }

    # ours
    e_o, p_o = parse_predictions(end_points, gt_data, config)
    e_o = assembly_pred_map_cls(e_o, p_o, config)
    g_o = assembly_gt_map_cls(parse_groundtruths(gt_data))
    calc_o = APCalculator(0.25, dc.class2type)
    calc_o.step(e_o["batch_pred_map_cls"], g_o)
    m_o = calc_o.compute_metrics()

    # reference
    t_end = {k: torch.from_numpy(v) for k, v in end_points.items()}
    t_gt = {k: torch.from_numpy(np.asarray(v)) for k, v in gt_data.items()}
    e_r, p_r = ref_ap_helper.parse_predictions(t_end, t_gt, config)
    e_r = ref_ap_helper.assembly_pred_map_cls(e_r, p_r, config)
    g_r = ref_ap_helper.assembly_gt_map_cls(
        ref_ap_helper.parse_groundtruths(t_gt, config)
    )
    calc_r = ref_ap_helper.APCalculator(0.25, dc.class2type)
    calc_r.step(e_r["batch_pred_map_cls"], g_r)
    m_r = calc_r.compute_metrics()

    for k in set(m_o) & set(m_r):
        np.testing.assert_allclose(
            float(m_o[k]), float(m_r[k]), atol=1e-6, err_msg=k
        )
    np.testing.assert_allclose(float(m_o["mAP"]), float(m_r["mAP"]), atol=1e-6)
