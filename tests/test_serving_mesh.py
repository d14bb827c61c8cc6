"""Multi-device serving dispatch (VERDICT r4 item 7).

Training scales over a mesh; with `serve_dp` the Predictor's scoring
dispatch does too: request rows shard over a 1-D 'data' mesh with
replicated params + corpus context. Every device computes full
contractions for its row block against identical weights; measured
agreement with the single-device predictor is 1 f32 ulp (XLA tiles the
per-shard row-block shapes differently than the full batch — the same
documented envelope as the request bucket ladder, BASELINE.md round-4
serving notes, which is why FEATURES_VERSION bumped there). ids/labels
must match exactly; float fields within 1e-6. Exercised on the suite's
8 virtual CPU devices.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # serves from the session checkpoint

from ultrafnd_git_tpu.serving import Predictor


def _assert_rows_equal(got, want, atol=1e-6):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["id"] == w["id"]
        assert g["label"] == w["label"]
        for k in ("prob_fake", "semantic_conflict", "temporal_delay",
                  "emotion_intensity"):
            np.testing.assert_allclose(g[k], w[k], atol=atol, err_msg=k)


def _records(n):
    pool = [
        ("外星人 入侵 地球 警告 危险", "外星 飞船 出现 危险 逃离"),
        ("辟谣 外星人 谣言 不实", "专家 辟谣 谣言 证据 科学"),
        ("普通 新闻 报道 今天", "今天 天气 晴朗"),
    ]
    return [
        {
            "video_id": f"m{i}",
            "title": pool[i % 3][0],
            "ocr": pool[i % 3][1],
            "comments": ["评论"] if i % 2 else [],
        }
        for i in range(n)
    ]


def test_serve_dp_bit_identical_to_single_device(v2_ckpt):
    import jax

    n_dev = len(jax.devices())
    assert n_dev >= 2  # conftest forces 8 virtual CPU devices
    single = Predictor(v2_ckpt, batch_size=8)
    multi = Predictor(v2_ckpt, batch_size=8, serve_dp=n_dev)
    assert multi._serve_mesh is not None
    assert multi._serve_mesh.devices.size == n_dev

    # 13 records -> bucket 16 (divides dp=8): the row-sharded path
    recs = _records(13)
    got = multi.predict(recs)
    want = single.predict(recs)
    _assert_rows_equal(got, want)

    # 5 records -> bucket 8, still divisible; 3 records with batch_size
    # 4 -> bucket 4 < dp -> replicated fallback (same program, same
    # devices-replicated placement -> exact)
    _assert_rows_equal(multi.predict(_records(5)), single.predict(_records(5)))
    small_m = Predictor(v2_ckpt, batch_size=4, serve_dp=n_dev)
    small_s = Predictor(v2_ckpt, batch_size=4)
    assert small_m.predict(_records(3)) == small_s.predict(_records(3))

    # the sharded path really engaged: a bucket-16 row input placed via
    # the serve mesh spans all devices
    from jax.sharding import NamedSharding, PartitionSpec

    arr = np.zeros((16, 4), np.float32)
    placed = jax.device_put(
        arr, NamedSharding(multi._serve_mesh, PartitionSpec("data"))
    )
    assert len(placed.sharding.device_set) == n_dev


def test_serve_dp_rejects_oversubscription(v2_ckpt):
    import jax

    with pytest.raises(ValueError, match="serve_dp"):
        Predictor(v2_ckpt, batch_size=8, serve_dp=len(jax.devices()) + 1)
