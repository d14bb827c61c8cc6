"""DynamicBatcher unit tests (stub predictor — no model, quick)."""
import threading
import time

import pytest

from ultrafnd_git_tpu.server import DynamicBatcher


class StubPredictor:
    """Echoes record ids; records every dispatch it receives. Models the
    split serving API the batcher pipelines around: featurize (stage 1,
    outside the device lock) + predict_featurized (stage 2, one
    dispatch), with predict() as the solo-retry/oversized fallback."""

    def __init__(self, fail_on=None, delay_s=0.0, featurize_s=0.0):
        self.calls = []
        self.fail_on = fail_on
        self.delay_s = delay_s
        self.featurize_s = featurize_s
        self.featurize_spans = []  # (start, end) per featurize call
        self.score_spans = []  # (start, end) per dispatch

    def featurize(self, records, id_offset=0):
        t0 = time.monotonic()
        if self.featurize_s:
            time.sleep(self.featurize_s)
        self.featurize_spans.append((t0, time.monotonic()))
        return {"records": list(records)}

    def _score(self, records):
        t0 = time.monotonic()
        self.calls.append([r["id"] for r in records])
        if self.delay_s:
            time.sleep(self.delay_s)
        try:
            if self.fail_on is not None and any(
                r["id"] == self.fail_on for r in records
            ):
                raise RuntimeError(f"boom on {self.fail_on}")
            return [{"id": r["id"], "prob_fake": 0.5} for r in records]
        finally:
            self.score_spans.append((t0, time.monotonic()))

    def predict_featurized(self, cache, count):
        assert count == len(cache["records"])
        return self._score(cache["records"])

    def predict(self, records):
        self.featurize(records)
        return self._score(records)


def _make(pred, **kw):
    return DynamicBatcher(pred, threading.Lock(), **kw)


def test_concurrent_submits_coalesce_and_split_exactly():
    pred = StubPredictor()
    b = _make(pred, window_ms=150.0)
    try:
        out = [None] * 6

        def call(i):
            out[i] = b.submit([{"id": f"a{i}"}, {"id": f"b{i}"}])

        ts = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        # every caller got ITS two rows back, in order
        for i in range(6):
            assert [r["id"] for r in out[i]] == [f"a{i}", f"b{i}"]
        # coalesced: strictly fewer dispatches than submits
        assert 1 <= len(pred.calls) < 6
        assert sum(len(c) for c in pred.calls) == 12  # nothing lost/dup'd
    finally:
        b.close()


def test_soak_random_sizes_under_sustained_concurrency():
    """Sustained mixed-size load: 24 threads x 8 sequential submits of
    1-7 records each, with nonzero featurize + dispatch latency so the
    two pipeline stages genuinely overlap the whole run. Every caller
    must get exactly ITS rows back in order (any fan-out off-by-one,
    window race, or handoff-queue bug shows up here as crossed or lost
    rows), and the queue must drain to empty."""
    import random

    pred = StubPredictor(delay_s=0.002, featurize_s=0.001)
    b = _make(pred, window_ms=5.0, gap_ms=1.0)
    rng = random.Random(0)
    sizes = {
        t: [rng.randint(1, 7) for _ in range(8)] for t in range(24)
    }
    errors = []

    def client(t):
        try:
            for j, size in enumerate(sizes[t]):
                recs = [{"id": f"t{t}r{j}k{k}"} for k in range(size)]
                out = b.submit(recs)
                assert [r["id"] for r in out] == [r["id"] for r in recs]
        except BaseException as exc:  # noqa: BLE001
            errors.append((t, exc))

    try:
        ts = [
            threading.Thread(target=client, args=(t,)) for t in range(24)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert not errors, errors[:3]
        total = sum(sum(s) for s in sizes.values())
        assert sum(len(c) for c in pred.calls) == total  # no loss, no dup
        assert b.records == total
        # sustained concurrency must actually coalesce
        assert b.batches < 24 * 8
        with b._cv:
            assert not b._queue  # drained
    finally:
        b.close()


def test_max_batch_splits_dispatches():
    pred = StubPredictor()
    b = _make(pred, window_ms=100.0, max_batch=3)
    try:
        out = [None] * 4

        def call(i):
            out[i] = b.submit([{"id": f"x{i}0"}, {"id": f"x{i}1"}])

        ts = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        for i in range(4):
            assert [r["id"] for r in out[i]] == [f"x{i}0", f"x{i}1"]
        # 8 records at max_batch=3 (entries never split) -> >= 3 calls,
        # each carrying at most one whole 2-record entry over the cap
        assert len(pred.calls) >= 3
        assert all(len(c) <= 3 for c in pred.calls)
    finally:
        b.close()


def test_error_isolated_to_offending_caller():
    """A failing record in a coalesced batch must not fail the innocent
    callers sharing its window: the batcher retries each entry alone."""
    pred = StubPredictor(fail_on="bad", delay_s=0.0)
    b = _make(pred, window_ms=150.0)
    try:
        errs = [None, None]
        oks = [None, None]

        def call(i, rid):
            try:
                oks[i] = b.submit([{"id": rid}])
            except RuntimeError as e:
                errs[i] = str(e)

        ts = [
            threading.Thread(target=call, args=(0, "bad")),
            threading.Thread(target=call, args=(1, "good")),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert errs[0] and "boom" in errs[0]  # offender gets ITS error
        assert errs[1] is None  # innocent caller unharmed
        assert oks[1] and oks[1][0]["id"] == "good"
        # batcher still serves after a failed dispatch
        ok = b.submit([{"id": "after"}])
        assert ok[0]["id"] == "after"
    finally:
        b.close()


def test_featurize_overlaps_inflight_dispatch():
    """The pipelined split (VERDICT r3 item 5): window N+1's
    featurization must START before window N's dispatch FINISHES —
    host featurize work no longer serializes with device scoring."""
    pred = StubPredictor(delay_s=0.4, featurize_s=0.05)
    b = _make(pred, window_ms=0.0)
    try:
        out = [None, None]

        def call(i):
            out[i] = b.submit([{"id": f"w{i}"}])

        t0 = threading.Thread(target=call, args=(0,))
        t0.start()
        # let window 0 enter its (long) dispatch, then queue window 1
        time.sleep(0.15)
        t1 = threading.Thread(target=call, args=(1,))
        t1.start()
        t0.join(timeout=30)
        t1.join(timeout=30)
        assert out[0][0]["id"] == "w0" and out[1][0]["id"] == "w1"
        assert len(pred.featurize_spans) == 2
        # featurize(w1) started before score(w0) ended
        assert pred.featurize_spans[1][0] < pred.score_spans[0][1], (
            pred.featurize_spans, pred.score_spans
        )
    finally:
        b.close()


def test_empty_submit_and_close():
    pred = StubPredictor()
    b = _make(pred, window_ms=0.0)
    assert b.submit([]) == []
    assert pred.calls == []  # no dispatch for an empty request
    b.close()
    with pytest.raises(RuntimeError):
        b.submit([{"id": "late"}])
