"""--auto_salt: validation-selected featurization draw (salt_search.py).

The offline protocol (scripts/salt_sweep.py, BASELINE.md "Tuning the
draw") showed val-selected salts generalize; these tests pin the
in-trainer version: candidates train, the val winner's artifacts are
adopted into out_dir, and the adopted directory serves exactly like a
direct `--hash_salt <winner>` run.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from ultrafnd_git_tpu.training.salt_search import (
    _tag,
    parse_salt_list,
    search_hash_salt,
)


def test_parse_salt_list():
    assert parse_salt_list(None) == []
    assert parse_salt_list("") == []
    assert parse_salt_list("a") == ["a"]
    assert parse_salt_list(" a, b ,,c") == ["a", "b", "c"]


def test_tag_is_filesystem_safe_and_collision_free():
    assert _tag("") == "unsalted"
    assert _tag("q1") == "salt_q1"
    # sanitized tags carry a digest of the raw salt, so candidates that
    # sanitize identically still get distinct run directories
    assert _tag("a/b c").startswith("salt_a_b_c_")
    assert _tag("a/b c") != _tag("a_b_c")
    assert _tag("a.b") != _tag("a_b")


def test_search_requires_a_candidate():
    from ultrafnd_git_tpu.training.trainer import TrainConfig

    cfg = TrainConfig(data_root="x", out_dir="y")
    with pytest.raises(ValueError, match="auto_salt"):
        search_hash_salt(cfg, [])


@pytest.mark.slow
def test_auto_salt_selects_and_adopts(fixture_data_root, tmp_path):
    """Two candidates train; the winner's out_dir artifacts are adopted
    and an eval-only run on the adopted dir reproduces the winner."""
    import dataclasses

    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    out = tmp_path / "out"
    cfg = TrainConfig(
        data_root=fixture_data_root,
        out_dir=str(out),
        batch_size=8,
        epochs=1,
        seed=0,
        log_metrics_jsonl=False,
    )
    winner, scores = search_hash_salt(cfg, ["q1"])

    # the unsalted baseline is always a candidate; winner maximizes val
    assert set(scores) == {"", "q1"}
    assert scores[winner] == max(scores.values())

    # search record + per-candidate run dirs are kept for inspection
    rec = json.loads((out / "salt_search.json").read_text())
    assert rec["winner"] == winner
    assert set(rec["val_scores"]) == {"", "q1"}  # keyed by the RAW salt
    assert rec["run_dirs"] == {"": "unsalted", "q1": "salt_q1"}
    for tag in ("unsalted", "salt_q1"):
        assert (out / "salt_search" / tag / "best" / "meta.json").exists()

    # the process-wide draw is left on the WINNER, not the last candidate
    from ultrafnd_git_tpu.ops.hashing import get_hash_salt

    assert get_hash_salt() == winner

    # adopted best slot records the winning salt; cache rode along
    meta = json.loads((out / "best" / "meta.json").read_text())
    assert meta["cfg"]["hash_salt"] == winner
    assert (out / "feature_cache.npz").exists()

    # eval-only on the adopted dir == eval-only on the winner's run dir
    # (the CLI path: hash_salt pinned to the winner, eval_only=True)
    res_adopted = ForensicTrainer(
        dataclasses.replace(cfg, hash_salt=winner, eval_only=True)
    ).test()
    res_winner = ForensicTrainer(
        dataclasses.replace(
            cfg,
            hash_salt=winner,
            eval_only=True,
            out_dir=str(out / "salt_search" / _tag(winner)),
        )
    ).test()
    for k in ("test_loss", "test_acc", "test_auc", "test_f1"):
        np.testing.assert_allclose(
            res_adopted[k], res_winner[k], rtol=0, atol=1e-7, err_msg=k
        )
