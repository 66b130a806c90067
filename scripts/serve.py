#!/usr/bin/env python
"""JSON-over-HTTP inference server for a trained PDAE stack (stdlib only).

Wraps ``pdae_tpu.serving.PDAEService``.  Endpoints:

  GET  /healthz                -> {"ok": true, "ops": [...]}
  POST /encode      {"images": [<b64 png>, ...]}            -> {"z": [[...]]}
  POST /autoencode  {"images": [...], "encode_style"?, "decode_style"?}
                                                            -> {"images": [...]}
  POST /generate    {"num_samples": N, "seed"?, ...}        -> {"images": [...]}
  POST /manipulate  {"images": [...], "attribute"|"class_id", "scale"?, ...}
                                                            -> {"images": [...]}

Images travel as base64-encoded PNG.  Concurrent image requests are
COALESCED into shared device batches (``--coalesce-ms`` window, default
3 ms; 0 falls back to sequential serving under one lock) -- N clients
posting one image each cost one bucketed XLA execution, not N.

  python scripts/serve.py --config configs/sampler/unconditional_sample.yml \
      --port 8080 [--platform cpu]
"""

import argparse
import base64
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _png_to_array(b64: str, channels: int = 3):
    import numpy as np
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(b64)))
    img = img.convert("RGB" if channels == 3 else "L")
    arr = np.asarray(img, np.uint8)
    return arr[..., None] if channels == 1 else arr


def _array_to_png(arr) -> str:
    from PIL import Image
    buf = io.BytesIO()
    img = arr[..., 0] if arr.shape[-1] == 1 else arr
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def make_handler(service, lock, batcher=None):
    """``batcher`` (pdae_tpu.serving.CoalescingBatcher): when given, the
    image-list ops go through it WITHOUT the global lock -- concurrent
    requests coalesce into one device batch per (op, kwargs) group; only
    ``generate`` (no batchable input) keeps the lock."""
    import numpy as np

    def _run(op, images, **kwargs):
        if batcher is not None:
            return batcher.submit(op, images, **kwargs)
        with lock:
            return getattr(service, op)(images, **kwargs)

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, obj):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                # advertise an op only when EVERY config key it loads is
                # present (generate: latent run config+ckpt+stats;
                # manipulate: classifier ckpt+stats -- sampling/context.py)
                cfg = service.config
                ops = ["encode", "autoencode"]
                if all(cfg.get(k) for k in ("latent_config_path",
                                            "latent_checkpoint_path",
                                            "inferred_latents_path")):
                    ops.append("generate")
                if all(cfg.get(k) for k in ("classifier_checkpoint_path",
                                            "inferred_latents_path")):
                    ops.append("manipulate")
                self._reply(200, {"ok": True, "ops": ops})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/encode":
                    x = np.stack([_png_to_array(b, service.channels)
                                  for b in req["images"]])
                    z = _run("encode", x)
                    self._reply(200, {"z": z.tolist()})
                elif self.path == "/autoencode":
                    x = np.stack([_png_to_array(b, service.channels)
                                  for b in req["images"]])
                    out = _run("autoencode", x,
                               encode_style=req.get("encode_style"),
                               decode_style=req.get("decode_style"))
                    self._reply(200, {"images": [
                        _array_to_png(im) for im in out]})
                elif self.path == "/generate":
                    with lock:
                        out = service.generate(
                            int(req.get("num_samples", 1)),
                            seed=int(req.get("seed", 0)),
                            latent_style=req.get("latent_style"),
                            decode_style=req.get("decode_style"))
                    self._reply(200, {"images": [
                        _array_to_png(im) for im in out]})
                elif self.path == "/manipulate":
                    x = np.stack([_png_to_array(b, service.channels)
                                  for b in req["images"]])
                    out = _run("manipulate", x,
                               attribute=req.get("attribute"),
                               class_id=int(req.get("class_id", 31)),
                               scale=float(req.get("scale", 0.3)),
                               encode_style=req.get("encode_style"),
                               decode_style=req.get("decode_style"))
                    self._reply(200, {"images": [
                        _array_to_png(im) for im in out]})
                else:
                    self._reply(404, {"error": "not found"})
            except (ValueError, KeyError, TypeError,
                    json.JSONDecodeError) as e:
                # malformed request (bad b64/JSON, unknown attribute,
                # oversized batch, wrong types) -> client error
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                # anything else (XLA faults, closed batcher, IO) is a
                # SERVER fault -- 5xx so monitors/retry policies engage
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--platform", default=None)
    p.add_argument("--coalesce-ms", type=float, default=3.0,
                   help="batch-coalescing window for concurrent image "
                        "requests; 0 disables (serve under one lock)")
    p.add_argument("--tp-size", type=int, default=None,
                   help="tensor parallelism over the local chips "
                        "(channel-sharded params; batch-1 low latency); "
                        "overrides the config's tp_size")
    p.add_argument("--sp-size", type=int, default=None,
                   help="spatial parallelism over the local chips "
                        "(H-sharded activations; batch-1 low latency for "
                        "the conv trunk); overrides the config's sp_size")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import threading

    from pdae_tpu.serving import CoalescingBatcher, PDAEService
    from pdae_tpu.utils import load_yaml

    cfg = load_yaml(args.config)
    if args.tp_size is not None:
        cfg["tp_size"] = args.tp_size
    if args.sp_size is not None:
        cfg["sp_size"] = args.sp_size
    service = PDAEService(cfg)
    batcher = (CoalescingBatcher(service, window_ms=args.coalesce_ms)
               if args.coalesce_ms > 0 else None)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service, threading.Lock(),
                                              batcher))
    print(f"serving on http://{args.host}:{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
