"""Resume-scan semantics of CheckpointIO (reference net_utils/utils.py:125-143)."""

import os

from pose2room_tpu.train.checkpoint import CheckpointIO


def _mk(path):
    os.makedirs(path, exist_ok=True)


def test_resume_picks_highest_epoch_within_run_dir(tmp_path):
    parent = tmp_path / "train"
    run_old = parent / "2026-01-01T00-00-00"
    for name in ("model_last_2", "model_last_10", "model_best"):
        _mk(run_old / name)
    # the new run dir (empty) is the one CheckpointIO would write into
    run_new = parent / "2026-01-02T00-00-00"
    _mk(run_new)

    ckpt = CheckpointIO(str(run_new))
    found = ckpt.find_resume_checkpoint()
    assert found == str(run_old / "model_last_10")


def test_resume_prefers_newest_run_dir(tmp_path):
    parent = tmp_path / "train"
    older = parent / "2026-01-01T00-00-00"
    newer = parent / "2026-01-03T00-00-00"
    _mk(older / "model_last_99")
    _mk(newer / "model_last_1")
    run = parent / "2026-01-04T00-00-00"
    _mk(run)

    ckpt = CheckpointIO(str(run))
    assert ckpt.find_resume_checkpoint() == str(newer / "model_last_1")


def test_resume_bare_model_last_loses_to_numbered(tmp_path):
    parent = tmp_path / "train"
    run_old = parent / "2026-01-01T00-00-00"
    _mk(run_old / "model_last")
    _mk(run_old / "model_last_5")
    run = parent / "2026-01-02T00-00-00"
    _mk(run)

    ckpt = CheckpointIO(str(run))
    assert ckpt.find_resume_checkpoint() == str(run_old / "model_last_5")


def test_resume_none_when_no_checkpoints(tmp_path):
    run = tmp_path / "train" / "2026-01-01T00-00-00"
    _mk(run)
    ckpt = CheckpointIO(str(run))
    assert ckpt.find_resume_checkpoint() is None
