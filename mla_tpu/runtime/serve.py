"""Inference over an exported serving artifact: batch CLI or HTTP server.

Batch mode:
    python -m mla_tpu.runtime.serve --artifact DIR --input feats.npz \
        [--output preds.npz] [--topk 5]

`feats.npz` holds one array per feature the artifact expects (names from its
meta.json, e.g. token/padding_mask/image), leading axis = examples. Requests
larger than the biggest exported batch rung are chunked. Output: fused
logits, per-modality logits, and top-k class ids — written to --output or
summarized to stdout.

Server mode (stdlib-only, no extra deps):
    python -m mla_tpu.runtime.serve --artifact DIR --http PORT
    GET  /meta     -> the artifact's meta.json
    GET  /healthz  -> 200 once the artifact is loaded
    POST /predict  -> body is an .npz of feature arrays; response is an
                      .npz of fused/per-modality logits (chunked through
                      the batch ladder like batch mode)

No model code, no config: everything comes from the artifact
(runtime/export.py); weights are device-resident across requests. The
reference has no equivalent — inference means re-running main.py's Python
model under torch (main.py:946-953).
"""

from __future__ import annotations

import argparse
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from mla_tpu.runtime.export import load_serving


def run_batch(srv, feats: dict, chunk: int | None = None):
    """Chunk a request of any length through the artifact's batch ladder."""
    names = srv.feature_names
    if names[0] not in feats:
        raise KeyError(f"serving request missing features "
                       f"{[k for k in names if k not in feats]}")
    n = int(np.asarray(feats[names[0]]).shape[0])
    if n < 1:
        raise ValueError("serving request has 0 rows")
    chunk = chunk or srv.batch_sizes[-1]
    outs = []
    for lo in range(0, n, chunk):
        outs.append(srv({k: np.asarray(v)[lo:lo + chunk]
                         for k, v in feats.items() if k in names}))
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


def make_server(srv, port: int, host: str = "127.0.0.1"
                ) -> ThreadingHTTPServer:
    """HTTP front for a loaded ServingModel. Returned server is not yet
    serving — call serve_forever() (or serve in a thread for tests).
    Device work is serialized with a lock: one TPU program at a time, the
    HTTP threads only parse/serialize."""
    import threading
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/meta":
                self._send(200, json.dumps(srv.meta).encode())
            elif self.path == "/healthz":
                self._send(200, b'{"ok": true}')
            else:
                self._send(404, b'{"error": "unknown path"}')

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b'{"error": "unknown path"}')
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                with np.load(io.BytesIO(self.rfile.read(n))) as z:
                    feats = {k: z[k] for k in z.files}
                with lock:
                    out = run_batch(srv, feats)
            except Exception as e:  # noqa: BLE001 — client error surface
                self._send(400, json.dumps({"error": str(e)}).encode())
                return
            buf = io.BytesIO()
            np.savez(buf, **out)
            self._send(200, buf.getvalue(), ctype="application/npz")

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    p = argparse.ArgumentParser(description="mla-tpu inference")
    p.add_argument("--artifact", required=True,
                   help="directory written by --export_dir")
    p.add_argument("--input", default=None, help=".npz of feature arrays")
    p.add_argument("--output", default=None,
                   help=".npz for logits + predictions (default: stdout "
                        "summary only)")
    p.add_argument("--topk", default=1, type=int)
    p.add_argument("--http", default=None, type=int, metavar="PORT",
                   help="serve over HTTP instead of batch mode")
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)

    srv = load_serving(args.artifact)
    if args.http is not None:
        httpd = make_server(srv, args.http, args.host)
        print(json.dumps({"serving": srv.meta["family"],
                          "port": httpd.server_address[1]}), flush=True)
        httpd.serve_forever()
        return
    if not args.input:
        raise SystemExit("--input is required in batch mode (or use --http)")
    with np.load(args.input) as z:
        feats = {k: z[k] for k in z.files}
    missing = [k for k in srv.feature_names if k not in feats]
    if missing:
        raise SystemExit(f"--input is missing features {missing} "
                         f"(artifact expects {srv.feature_names})")
    out = run_batch(srv, feats)
    order = np.argsort(-out["fused"], axis=1)
    out["topk"] = order[:, :args.topk].astype(np.int32)
    if args.output:
        np.savez(args.output, **out)
    n = out["fused"].shape[0]
    summary = {
        "examples": n, "n_classes": int(out["fused"].shape[1]),
        "family": srv.meta["family"],
        "pred_head": out["topk"][:, 0][:16].tolist(),
        "output": args.output}
    if "label" in feats:  # labeled npz: report accuracy directly
        label = np.asarray(feats["label"]).reshape(-1)[:n]
        summary["accuracy"] = float(np.mean(out["topk"][:, 0] == label))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
