#!/usr/bin/env python3
"""HTTP serving throughput under concurrent single-record clients.

Measures the dynamic-batching win (ultrafnd_git_tpu/server.py
DynamicBatcher): N client threads each fire sequential 1-record
POST /predict calls; with coalescing OFF every record pays a full
device dispatch (~90 ms on the tunneled chip), with it ON concurrent
arrivals share one.

  python scripts/bench_http_serving.py --out_dir /tmp/v_out \
      --clients 16 --requests 8 [--cpu]

Prints one line per window setting: records/s + dispatches issued.
"""
import argparse
import http.client
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _post(url: str, payload: dict, timeout: float = 300.0) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


class _KeepAliveClient:
    """One persistent HTTP/1.1 connection (the server speaks 1.1 now);
    per-request urllib connections paid a TCP handshake + a server-side
    thread spawn PER RECORD under ThreadingHTTPServer."""

    def __init__(self, host: str, port: int, timeout: float = 300.0):
        self.conn = http.client.HTTPConnection(host, port, timeout=timeout)

    def post(self, path: str, payload: dict) -> dict:
        body = json.dumps(payload)
        try:
            self.conn.request(
                "POST", path, body=body,
                headers={"Content-Type": "application/json"},
            )
            resp = self.conn.getresponse()
            data = resp.read()
        except (http.client.HTTPException, ConnectionError, OSError):
            # server closed the connection (idle timeout/restart):
            # reconnect once
            self.conn.close()
            self.conn.request(
                "POST", path, body=body,
                headers={"Content-Type": "application/json"},
            )
            resp = self.conn.getresponse()
            data = resp.read()
        out = json.loads(data)
        if resp.status != 200:
            raise RuntimeError(f"HTTP {resp.status}: {out}")
        return out

    def close(self) -> None:
        self.conn.close()


def run_loadgen(
    host: str, port: int, records, clients: int, requests: int
) -> float:
    """N threads x sequential 1-record POSTs over persistent
    connections; returns elapsed seconds. Used in-process and by the
    --loadgen subprocess mode (out-of-process attribution)."""
    conns = [_KeepAliveClient(host, port) for _ in range(clients)]

    def client(i):
        for _ in range(requests):
            conns[i].post("/predict", {"records": [records[i]]})

    ts = [
        threading.Thread(target=client, args=(i,)) for i in range(clients)
    ]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.perf_counter() - t0
    for c in conns:
        c.close()
    return dt


def _bench_records(n: int):
    return [
        {
            "video_id": f"bench{i}",
            "title": f"警告 危险 外星 入侵 信号 {i}",
            "ocr": f"飞船 出现 逃离 城市 {i}",
            "comments": [f"评论 {i}"],
        }
        for i in range(n)
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=8,
                    help="sequential 1-record requests per client")
    ap.add_argument("--windows", default="-1,5",
                    help="comma list of batch_window_ms values "
                         "(-1 = coalescing disabled)")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--no_http", action="store_true",
        help="drive the DynamicBatcher directly (in-process submit()), "
             "isolating serving capability from HTTP/client-thread "
             "overhead — on a 1-core host the N client threads contend "
             "with the server for the same core",
    )
    ap.add_argument(
        "--loadgen", default=None, metavar="HOST:PORT",
        help="(internal) run ONLY the load generator against an external "
             "server and print LOADGEN <n> <dt>; spawned as a separate "
             "process by --client_proc for contention attribution",
    )
    ap.add_argument(
        "--client_proc", action="store_true",
        help="run the load generator in a SEPARATE PROCESS and report "
             "the server process's CPU seconds vs the run's wall time — "
             "attributes the HTTP-vs-direct gap between server-side "
             "cost and loadgen contention (VERDICT r4 item 1)",
    )
    args = ap.parse_args()

    if args.loadgen:
        host, port = args.loadgen.rsplit(":", 1)
        records = _bench_records(args.clients)
        # untimed warm round (connections, thread paths), then the
        # timed one; the parent snapshots dispatch counters between
        run_loadgen(host, int(port), records, args.clients, 1)
        print("WARMDONE", flush=True)
        dt = run_loadgen(host, int(port), records, args.clients,
                         args.requests)
        print(f"LOADGEN {args.clients * args.requests} {dt:.4f}",
              flush=True)
        return

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.server import make_server
    from ultrafnd_git_tpu.serving import Predictor

    predictor = Predictor(args.out_dir, batch_size=args.batch_size)
    # warm the whole featurize/score bucket ladder, not just one bucket:
    # dynamic-batching windows produce variable sizes, and on a cold
    # compile cache the per-bucket remote compiles land INSIDE the timed
    # runs otherwise (measured: 10.2 records/s cold vs 146.3 warm on the
    # identical protocol — BASELINE.md round-4 session 2)
    predictor.warmup(max(8, 2 * args.clients))

    records = _bench_records(args.clients)

    if args.no_http:
        import threading as _th

        from ultrafnd_git_tpu.server import DynamicBatcher

        for w in (float(x) for x in args.windows.split(",")):
            if w < 0:
                continue  # per-request path needs the HTTP layer
            b = DynamicBatcher(predictor, _th.Lock(), window_ms=w)
            try:
                b.submit(records[:1])  # warm (compile)
                warm = b.batches

                def bclient(i):
                    for _ in range(args.requests):
                        b.submit([records[i]])

                ts = [
                    threading.Thread(target=bclient, args=(i,))
                    for i in range(args.clients)
                ]
                t0 = time.perf_counter()
                for t in ts:
                    t.start()
                for t in ts:
                    t.join()
                dt = time.perf_counter() - t0
                n = args.clients * args.requests
                print(
                    f"batcher window={w:g}ms {n} records in {dt:6.2f}s = "
                    f"{n/dt:7.1f} records/s  ({b.batches - warm} "
                    "dispatches)",
                    flush=True,
                )
            finally:
                b.close()
        return

    for w in (float(x) for x in args.windows.split(",")):
        window = None if w < 0 else w
        server = make_server(
            predictor, port=0, batch_window_ms=window, quiet=True
        )
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        port = server.server_address[1]
        url = f"http://127.0.0.1:{port}/predict"
        try:
            _post(url, {"records": records[:1]})  # warm (compile)
            warm_batches = (
                server.batcher.batches if server.batcher is not None
                else 0
            )

            n = args.clients * args.requests
            if args.client_proc:
                # out-of-process attribution: the loadgen subprocess
                # owns the client threads; this (server) process's CPU
                # seconds over the run's wall time = the server-side
                # share of the core. The subprocess warms first and
                # prints WARMDONE, so counters/timers bracket only the
                # timed round.
                import os
                import subprocess

                proc = subprocess.Popen(
                    [
                        sys.executable, __file__,
                        "--loadgen", f"127.0.0.1:{port}",
                        "--clients", str(args.clients),
                        "--requests", str(args.requests),
                        "--out_dir", args.out_dir,
                    ],
                    stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                    text=True,
                    env=dict(os.environ, JAX_PLATFORMS="cpu"),
                )
                line = proc.stdout.readline().strip()
                assert line == "WARMDONE", (line, proc.stderr.read())
                warm_batches = (
                    server.batcher.batches
                    if server.batcher is not None else 0
                )
                cpu0 = time.process_time()
                t0 = time.perf_counter()
                line = proc.stdout.readline().strip()
                wall = time.perf_counter() - t0
                cpu = time.process_time() - cpu0
                proc.wait(timeout=60)
                toks = line.split()
                assert toks and toks[0] == "LOADGEN", line
                dt = float(toks[2])
                extra = (
                    f"  [server-proc CPU {cpu:5.2f}s / wall {wall:5.2f}s"
                    f" = {100 * cpu / wall:4.1f}% core share]"
                )
            else:
                run_loadgen(
                    "127.0.0.1", port, records, args.clients, 1
                )  # warm the persistent connections + every thread path
                warm_batches = (
                    server.batcher.batches
                    if server.batcher is not None else 0
                )
                dt = run_loadgen(
                    "127.0.0.1", port, records, args.clients,
                    args.requests,
                )
                extra = ""
            dispatches = (
                server.batcher.batches - warm_batches
                if server.batcher is not None
                else n
            )
            label = "off" if window is None else f"{window:g}ms"
            print(
                f"window={label:5s} {n} records in {dt:6.2f}s = "
                f"{n/dt:7.1f} records/s  ({dispatches} dispatches)"
                f"{extra}",
                flush=True,
            )
        finally:
            server.shutdown()
            if server.batcher is not None:
                server.batcher.close()
            thread.join(timeout=5)


if __name__ == "__main__":
    main()
