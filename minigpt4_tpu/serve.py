"""Minimal production serving surface: a stdlib HTTP JSON API over
:class:`~minigpt4_tpu.engine.sessions.SessionPool`.

The reference's only serving surface is the single-session gradio UI; this
exposes the concurrent-session engine over plain HTTP with zero extra
dependencies (http.server), so it runs — and is tested — in any environment:

    python -m minigpt4_tpu.serve model.bin vicuna.bin --port 8000

API (JSON unless noted):
  POST   /v1/sessions                          -> {"session_id": int}
  POST   /v1/sessions/{id}/image   (PNG/JPEG body) -> {"ok": true}
  POST   /v1/sessions/{id}/chat    {"message", "limit"?, "temp"?, "top_k"?,
                                    "top_p"?}  -> {"text": "..."}
                                    (?stream=1 -> chunked text/plain stream)
  DELETE /v1/sessions/{id}                     -> {"ok": true}
  GET    /v1/health                            -> {"ok": true, "sessions": n}

Device dispatches serialize inside the pool; HTTP handling is threaded, so
several clients can stream concurrently at chunk granularity.
"""

from __future__ import annotations

import argparse
import io
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .engine.sampling import SamplingParams
from .engine.sessions import SessionPool
from . import image as image_mod


class _Server:
    """Thin HTTP adapter; the SessionPool's registry is the single source of
    truth for session lifetime (no duplicate bookkeeping here)."""

    def __init__(self, pool: SessionPool):
        self.pool = pool

    def create(self) -> int:
        return self.pool.new_session().session_id

    def get(self, sid: int):
        return self.pool._sessions.get(sid)

    def drop(self, sid: int) -> bool:
        s = self.pool._sessions.get(sid)
        if s is not None:
            s.close()
        return s is not None

    def count(self) -> int:
        return len(self.pool._sessions)


def make_handler(srv: _Server):
    sess_re = re.compile(r"^/v1/sessions/(\d+)(/(image|chat))?$")

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked transfer needs 1.1 framing

        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def do_GET(self):
            if self.path == "/v1/health":
                self._json(200, {"ok": True, "sessions": srv.count(),
                                 "metrics": dict(srv.pool.metrics)})
            else:
                self._json(404, {"error": "not found"})

        def do_DELETE(self):
            m = sess_re.match(self.path)
            if m and not m.group(2):
                ok = srv.drop(int(m.group(1)))
                self._json(200 if ok else 404, {"ok": ok})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/v1/sessions":
                self._json(200, {"session_id": srv.create()})
                return
            m = sess_re.match(self.path.split("?")[0])
            if not m or not m.group(3):
                self._json(404, {"error": "not found"})
                return
            s = srv.get(int(m.group(1)))
            if s is None:
                self._json(404, {"error": "no such session"})
                return
            kind = m.group(3)
            try:
                if kind == "image":
                    from PIL import Image

                    img = Image.open(io.BytesIO(self._body())).convert("RGB")
                    size = srv.pool.engine.vision_cfg.vit.image_size
                    s.upload_image(image_mod.preprocess(np.asarray(img), size=size))
                    self._json(200, {"ok": True})
                    return
                req = json.loads(self._body() or b"{}")
                params = SamplingParams(
                    temp=float(req.get("temp", 0.8)),
                    top_k=int(req.get("top_k", 40)),
                    top_p=float(req.get("top_p", 0.9)),
                )
                limit = int(req.get("limit", 256))
                s.ask(str(req.get("message", "")))
                if "stream=1" in self.path:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; charset=utf-8")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    try:
                        for tok in s.generate(limit=limit, params=params):
                            data = tok.encode()
                            self.wfile.write(
                                f"{len(data):x}\r\n".encode() + data + b"\r\n"
                            )
                    except Exception:
                        # headers are out: a mid-stream error can only
                        # terminate the chunked body, never a second response
                        pass
                    self.wfile.write(b"0\r\n\r\n")
                    return
                text = "".join(s.generate(limit=limit, params=params))
                self._json(200, {"text": text})
            except Exception as e:  # surface engine errors as 500s, keep serving
                if not self.wfile.closed:
                    try:
                        self._json(500, {"error": f"{type(e).__name__}: {e}"})
                    except Exception:
                        pass

    return Handler


def start_server(model_path, llm_path, host="127.0.0.1", port=8000,
                 session_ctx: int = 512, **engine_kwargs) -> ThreadingHTTPServer:
    pool = SessionPool(model_path, llm_path, session_ctx=session_ctx, **engine_kwargs)
    srv = _Server(pool)
    httpd = ThreadingHTTPServer((host, port), make_handler(srv))
    httpd.pool = pool  # for tests / shutdown
    return httpd


def main():
    ap = argparse.ArgumentParser(description="minigpt4_tpu HTTP serving")
    ap.add_argument("model_path")
    ap.add_argument("llm_model_path")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--session-ctx", type=int, default=512)
    ap.add_argument("--n-ctx", type=int, default=2048)
    args = ap.parse_args()
    httpd = start_server(args.model_path, args.llm_model_path, args.host,
                         args.port, session_ctx=args.session_ctx, n_ctx=args.n_ctx)
    print(f"serving on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
