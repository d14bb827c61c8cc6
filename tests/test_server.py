"""HTTP serving: live ThreadingHTTPServer against a trained out_dir."""
import json
import threading
import urllib.error
import urllib.request

import pytest

pytestmark = pytest.mark.slow  # trains a checkpoint to serve from

from ultrafnd_git_tpu.server import make_server
from ultrafnd_git_tpu.serving import Predictor

RECORDS = [
    {
        "video_id": "h_fake",
        "title": "外星人 入侵 地球 警告 危险",
        "ocr": "外星 飞船 出现 危险 逃离",
        "comments": ["太可怕了 赶紧转发"],
    },
    {
        "video_id": "h_real",
        "title": "辟谣 外星人 谣言 不实",
        "ocr": "专家 辟谣 谣言 证据 科学",
        "comments": ["官方已经辟谣了"],
    },
]


@pytest.fixture(scope="module")
def live_server(v2_ckpt):
    # serves the session-shared plain checkpoint (conftest.py v2_ckpt)
    predictor = Predictor(v2_ckpt, batch_size=4)
    server = make_server(predictor, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield {
        "url": f"http://127.0.0.1:{server.server_address[1]}",
        "server": server,
        "predictor": predictor,
    }
    server.shutdown()
    if server.batcher is not None:
        server.batcher.close()
    thread.join(timeout=5)


def _post(url: str, payload: dict) -> tuple:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_healthz(live_server):
    live_server = live_server["url"]
    with urllib.request.urlopen(f"{live_server}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200
    assert body["status"] == "ok"
    assert "backend" in body


def test_stats_endpoint_reports_batcher_efficiency(live_server):
    url = live_server["url"]
    status, _ = _post(f"{url}/predict", {"records": RECORDS})
    assert status == 200
    with urllib.request.urlopen(f"{url}/stats", timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200
    assert body["requests"] >= 1
    assert body["records_served"] >= len(RECORDS)
    b = body["batcher"]
    assert b["dispatches"] >= 1
    assert b["records"] >= len(RECORDS)
    assert b["avg_records_per_dispatch"] >= 1
    assert b["queued_records"] == 0  # nothing in flight between requests
    assert b["max_batch"] == 4096


def test_predict_endpoint_matches_library(live_server):
    live_server = live_server["url"]
    status, body = _post(f"{live_server}/predict", {"records": RECORDS})
    assert status == 200
    preds = body["predictions"]
    assert [p["id"] for p in preds] == ["h_fake", "h_real"]
    for p in preds:
        assert 0.0 <= p["prob_fake"] <= 1.0
        assert p["label"] in (0, 1)


def test_explain_endpoint(live_server):
    live_server = live_server["url"]
    status, body = _post(
        f"{live_server}/explain",
        {"records": RECORDS[:1], "method": "grad", "top_k": 2},
    )
    assert status == 200
    [p] = body["predictions"]
    assert p["explain"]["method"] == "grad_x_input"
    assert len(p["explain"]["top_fused_dims"]) == 2


def test_error_paths_stay_up(live_server):
    live_server = live_server["url"]
    # malformed JSON
    req = urllib.request.Request(
        f"{live_server}/predict", data=b"not json{",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400

    # records not a list
    status, body = _post(f"{live_server}/predict", {"records": "nope"})
    assert status == 400 and "error" in body

    # unknown explain method -> 400, not a crash
    status, body = _post(
        f"{live_server}/explain", {"records": RECORDS, "method": "lime"}
    )
    assert status == 400 and "error" in body

    # valid JSON that is not an object -> 400 with a JSON reply (was an
    # AttributeError that dropped the connection with no response)
    req = urllib.request.Request(
        f"{live_server}/predict", data=b"[1, 2]",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400

    # bad numeric explain params -> client 400s, never NaN-laden 200s
    status, body = _post(
        f"{live_server}/explain",
        {"records": RECORDS[:1], "method": "shap", "background_size": 0},
    )
    assert status == 400 and "background_size" in body["error"]
    status, body = _post(
        f"{live_server}/explain",
        {"records": RECORDS[:1], "method": "shap", "n_coalitions": {"x": 1}},
    )
    assert status == 400 and "error" in body

    # unknown path
    status, body = _post(f"{live_server}/nope", {"records": []})
    assert status == 404

    # server still healthy and counted the good requests
    with urllib.request.urlopen(f"{live_server}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["requests"] >= 2


def test_dynamic_batching_exact_and_coalesced(live_server):
    """Concurrent 1-record /predict requests coalesce into one device
    dispatch AND every caller gets exactly the rows it would have gotten
    alone (scoring is row-independent — server.py module docstring)."""
    from ultrafnd_git_tpu.server import make_server as _mk

    predictor = live_server["predictor"]
    # distinct records so a row swap between callers would be visible
    recs = [
        {
            "video_id": f"r{i}",
            "title": f"警告 危险 外星 入侵 {i}",
            "ocr": f"飞船 出现 逃离 {i}",
            "comments": [f"c{i}"],
        }
        for i in range(8)
    ]
    # wide window so all 8 concurrent requests deterministically coalesce
    server = _mk(predictor, port=0, batch_window_ms=300.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        results = [None] * len(recs)
        barrier = threading.Barrier(len(recs))

        def call(i):
            barrier.wait(timeout=60)  # release all clients together
            status, body = _post(f"{url}/predict", {"records": [recs[i]]})
            results[i] = (status, body)

        threads = [
            threading.Thread(target=call, args=(i,))
            for i in range(len(recs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)

        direct = predictor.predict(recs)  # the single-caller truth
        one_dispatch = server.batcher.batches == 1
        for i, (status, body) in enumerate(results):
            assert status == 200
            [p] = body["predictions"]
            assert p["id"] == f"r{i}"  # no row swaps across callers
            if one_dispatch:
                # same bucket shape as the direct call -> bitwise equal
                assert p["prob_fake"] == direct[i]["prob_fake"]
            else:
                # a straggler split the window: different power-of-two
                # bucket pads may reassociate reductions — same row
                # values within float tolerance
                assert abs(p["prob_fake"] - direct[i]["prob_fake"]) < 1e-5
        # 8 requests, far fewer dispatches (usually 1; >1 only if a
        # request arrived after the first window closed)
        assert server.batcher.batches < len(recs)
    finally:
        server.shutdown()
        server.batcher.close()
        thread.join(timeout=5)


def test_batching_disabled_still_serves(live_server):
    """batch_window_ms=None keeps the direct per-request lock path."""
    from ultrafnd_git_tpu.server import make_server as _mk

    server = _mk(live_server["predictor"], port=0, batch_window_ms=None)
    assert server.batcher is None
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        status, body = _post(f"{url}/predict", {"records": RECORDS[:1]})
        assert status == 200 and len(body["predictions"]) == 1
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_artifact_serving_through_dynamic_batcher(v2_ckpt, tmp_path):
    """scripts/serve.py --artifact serves an ExportedPredictor through
    the same DynamicBatcher pipeline (featurize outside the lock, one
    AOT dispatch under it) — coalesced HTTP rows must match the
    ExportedPredictor's direct predict() row for row."""
    from ultrafnd_git_tpu.export_serving import (
        ExportedPredictor,
        export_artifact,
    )

    live = Predictor(v2_ckpt, batch_size=4)
    art = tmp_path / "artifact"
    export_artifact(live, str(art), platforms=("cpu",))
    served = ExportedPredictor(str(art), batch_size=4)

    server = make_server(served, port=0, batch_window_ms=150.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        direct = served.predict(RECORDS)
        results = [None, None]
        barrier = threading.Barrier(2)

        def call(i):
            barrier.wait(timeout=60)
            status, body = _post(f"{url}/predict", {"records": [RECORDS[i]]})
            results[i] = (status, body)

        ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        for i, (status, body) in enumerate(results):
            assert status == 200
            [p] = body["predictions"]
            assert p["id"] == direct[i]["id"]
            assert abs(p["prob_fake"] - direct[i]["prob_fake"]) < 1e-6
        # the AOT scorer actually dispatched through the batcher
        assert server.batcher.batches >= 1
    finally:
        server.shutdown()
        server.batcher.close()
        thread.join(timeout=5)
