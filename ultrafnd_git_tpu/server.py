"""HTTP serving for a trained out_dir — stdlib only, no new deps.

The reference has no serving story at all (its classifier exposes
`predict`/`predict_proba` methods, `deep_truth_classifier.py:176-184`,
but nothing routes records to them). This module makes the rebuilt
serving path (`serving.Predictor`) deployable:

  POST /predict   {"records": [...]}                  -> {"predictions": [...]}
  POST /explain   {"records": [...], "method": "grad",
                   "top_k": 8}                        -> {"predictions": [...]}
  GET  /healthz                                       -> {"status": "ok", ...}

Records use `data_complete.json` semantics (title/ocr/comments/...).

Design notes:
  * ThreadingHTTPServer accepts concurrent connections, but scoring is
    serialized behind one lock: the Predictor's jitted programs and
    featurize prefetch pool are single-pipeline by design, and the
    1-request-at-a-time contract bounds device memory. Throughput comes
    from batching records per request (the Predictor's backend-aware
    chunking), not from concurrent small requests.
  * errors return JSON {"error": ...} with 4xx/5xx — malformed input
    never takes the server down.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from ultrafnd_git_tpu.serving import Predictor

MAX_BODY_BYTES = 64 * 1024 * 1024  # one request can carry many records


class _Handler(BaseHTTPRequestHandler):
    # class attributes injected by make_server
    predictor: Predictor
    lock: threading.Lock
    stats: Dict[str, Any]
    quiet: bool = True

    # ------------------------------------------------------------------
    def _reply(self, code: int, payload: Dict[str, Any]) -> None:
        body = json.dumps(payload, ensure_ascii=False).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # noqa: D102 - BaseHTTPRequestHandler
        if not self.quiet:
            super().log_message(fmt, *args)

    def _read_json(self) -> Optional[Dict[str, Any]]:
        try:
            length = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            length = 0
        if length <= 0 or length > MAX_BODY_BYTES:
            self._reply(400, {"error": "missing or oversized request body"})
            return None
        try:
            payload = json.loads(self.rfile.read(length).decode("utf-8"))
        except Exception as exc:
            self._reply(400, {"error": f"invalid JSON: {exc}"})
            return None
        if not isinstance(payload, dict):
            # valid JSON but not an object ('[1,2]', '"x"', '5') would
            # otherwise AttributeError outside do_POST's try block and
            # drop the connection with no HTTP reply
            self._reply(400, {"error": "request body must be a JSON object"})
            return None
        return payload

    # ------------------------------------------------------------------
    def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
        if self.path.rstrip("/") in ("", "/healthz"):
            import jax

            self._reply(
                200,
                {
                    "status": "ok",
                    "backend": jax.default_backend(),
                    "records_served": self.stats["records"],
                    "requests": self.stats["requests"],
                },
            )
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self) -> None:  # noqa: N802
        if self.path not in ("/predict", "/explain"):
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        payload = self._read_json()
        if payload is None:
            return
        records = payload.get("records")
        if not isinstance(records, list):
            self._reply(400, {"error": "'records' must be a list"})
            return
        if self.path == "/explain":
            # numeric params validated HERE so a bad value is the
            # client's 400, not a NaN-producing or silently-degraded
            # 200 (a non-numeric n_coalitions would otherwise throw
            # inside kernel_shap and be caught by explain_shap's
            # smooth-grad fallback)
            try:
                top_k = int(payload.get("top_k", 8))
                n_coalitions = payload.get("n_coalitions")
                if n_coalitions is not None:
                    n_coalitions = int(n_coalitions)
                background_size = int(payload.get("background_size", 32))
                if background_size < 1:
                    raise ValueError("background_size must be >= 1")
            except (ValueError, TypeError) as exc:
                self._reply(400, {"error": f"bad explain params: {exc}"})
                return
        try:
            with self.lock:
                if self.path == "/predict":
                    preds = self.predictor.predict(records)
                else:
                    preds = self.predictor.explain(
                        records,
                        method=payload.get("method", "grad"),
                        top_k=top_k,
                        n_coalitions=n_coalitions,
                        background_size=background_size,
                    )
                self.stats["requests"] += 1
                self.stats["records"] += len(preds)
        except ValueError as exc:  # bad method/params
            self._reply(400, {"error": str(exc)})
            return
        except Exception as exc:  # scoring failure: report, stay up
            self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._reply(200, {"predictions": preds})


def make_server(
    predictor: Predictor,
    host: str = "127.0.0.1",
    port: int = 8080,
    quiet: bool = True,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server bound to (host, port).

    Call `.serve_forever()` (blocking) or run it in a thread;
    `.shutdown()` stops it. Port 0 binds an ephemeral port
    (`server.server_address[1]` reports it) — used by the tests.
    """
    handler = type(
        "BoundHandler",
        (_Handler,),
        {
            "predictor": predictor,
            "lock": threading.Lock(),
            "stats": {"requests": 0, "records": 0},
            "quiet": quiet,
        },
    )
    return ThreadingHTTPServer((host, port), handler)
