"""Multi-modal generation + TMD diversity metric, end-to-end on CPU."""

import glob
import os

import numpy as np
import jax
import pytest

from pose2room_tpu.eval.multi_modal import multi_modal_metrics, read_pred_npz
from pose2room_tpu.models import P2RNet, P2RNetConfig


TINY = P2RNetConfig(num_frames=48, num_seeds=32, num_proposals=8, num_gaussian=8)


def test_generate_multi_mode_stochastic(rng):
    """Bernoulli multi-mode sampling: different keys -> different outputs."""
    model = P2RNet(config=TINY)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, TINY.num_frames, 53, 3))
    variables = model.init({"params": key, "mdn": key}, x, train=False)

    outs = []
    for seed in (1, 2):
        out = model.apply(
            variables,
            x,
            multi_mode=True,
            n_samples=5,
            method=P2RNet.generate,
            rngs={"mdn": jax.random.PRNGKey(seed)},
        )
        outs.append(np.asarray(out["center"]))
        assert "pi" in out
    assert not np.array_equal(outs[0], outs[1])

    # same key -> deterministic
    out2 = model.apply(
        variables, x, multi_mode=True, n_samples=5,
        method=P2RNet.generate, rngs={"mdn": jax.random.PRNGKey(1)},
    )
    np.testing.assert_array_equal(outs[0], np.asarray(out2["center"]))


def _write_fake_run(root, name, boxes_by_sample, map_score):
    run = os.path.join(root, name)
    for sample, boxes in boxes_by_sample.items():
        d = os.path.join(run, "visualization", sample)
        os.makedirs(d, exist_ok=True)
        obbs = np.array([b[0] for b in boxes])
        cls = np.array([b[1] for b in boxes])
        inst_idx = np.zeros(16, dtype=bool)
        for i, b in enumerate(boxes):
            inst_idx[b[2]] = True
        np.savez(
            os.path.join(d, "000000_pred_confident_nms_bbox.npz"),
            obbs=obbs, cls=cls, inst_idx=inst_idx,
        )
    with open(os.path.join(run, "log.txt"), "w") as f:
        f.write(f"eval mAP: {map_score:.6f}\n")
    return run


def test_tmd_metrics(tmp_path, rng):
    # two runs with identical boxes -> zero shape variance, zero entropy
    box = (np.array([0, 0, 0, 1, 1, 1, 0.3]), 4, 2)
    runs = [
        _write_fake_run(str(tmp_path), "runA", {"s1": [box]}, 0.25),
        _write_fake_run(str(tmp_path), "runB", {"s1": [box]}, 0.35),
    ]
    max_map, tmd = multi_modal_metrics(runs)
    np.testing.assert_allclose(max_map, [0.35])
    assert abs(tmd - 1.0) < 1e-9  # (0 entropy + 1) * (0 variance + 1)

    # differing class + position -> TMD grows
    box2 = (np.array([0.5, 0, 0, 1, 1, 1, 0.3]), 7, 2)
    runs2 = [
        _write_fake_run(str(tmp_path), "runC", {"s1": [box]}, 0.2),
        _write_fake_run(str(tmp_path), "runD", {"s1": [box2]}, 0.2),
    ]
    _, tmd2 = multi_modal_metrics(runs2)
    assert tmd2 > 1.5  # entropy 1 bit, nonzero variance


def test_read_pred_npz_roundtrip(tmp_path):
    obbs = np.array([[0, 0, 0, 2, 1, 1, 0.5]])
    inst_idx = np.zeros(8, dtype=bool)
    inst_idx[3] = True
    np.savez(tmp_path / "p.npz", obbs=obbs, cls=np.array([5]), inst_idx=inst_idx)
    insts = read_pred_npz(tmp_path / "p.npz")
    assert len(insts) == 1
    assert insts[0]["inst_id"] == 3
    assert insts[0]["class_id"] == 5
    assert insts[0]["corners"].shape == (8, 3)
