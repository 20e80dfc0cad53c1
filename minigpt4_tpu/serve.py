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
import queue
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .engine.sampling import SamplingParams
from .engine.sessions import SessionPool
from . import image as image_mod


class _Batcher:
    """Dynamic request batching: concurrent /chat generations arriving within
    ``window_s`` are decoded TOGETHER via SessionPool.generate_batch_stream —
    every fused decode step reads the weights once for the whole group, so N
    concurrent clients each see ~single-stream latency instead of 1/N
    (bandwidth-bound decode).  Requests join at generation boundaries
    (static batching per group; prompts prefill individually before
    enqueueing)."""

    _DONE = object()

    def __init__(self, pool: SessionPool, window_s: float, max_batch: int = 8):
        self.pool = pool
        self.window_s = window_s
        self.max_batch = max_batch
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, session, limit: int, params) -> "queue.Queue":
        """Session must already have a prepared prompt.  Returns a queue of
        str tokens terminated by _Batcher._DONE."""
        out: queue.Queue = queue.Queue()
        self._q.put((session, limit, params, out))
        return out

    def _run(self) -> None:
        while True:
            first = self._q.get()
            group = [first]
            deadline = time.monotonic() + self.window_s
            while len(group) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    group.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            # mixed sampler configs share one batched decode (per-lane
            # traced sampling, device_sampling.lane_rows); only mirostat
            # is host-stateful and decodes per-session
            mirostat = [g for g in group if g[2].mirostat != 0]
            rest = [g for g in group if g[2].mirostat == 0]
            if rest:
                self._decode_group(rest)
            for g in mirostat:
                self._decode_single(g)

    def _decode_single(self, req) -> None:
        session, limit, params, out = req
        try:
            for token in self.pool.generate(session, limit, params):
                out.put(token)
        except Exception as e:
            import sys

            print(f"[serve] mirostat decode failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            out.put(e)
        out.put(self._DONE)

    def _decode_group(self, group) -> None:
        sessions = [g[0] for g in group]
        limits = [g[1] for g in group]
        outs = [g[3] for g in group]
        try:
            for updates in self.pool.generate_batch_stream(
                sessions, limit=limits, params=[g[2] for g in group]
            ):
                for i, token in updates:
                    outs[i].put(token)
        except Exception as e:
            import sys

            print(f"[serve] batched decode failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            err = e
        else:
            err = None
        for out in outs:
            if err is not None:
                out.put(err)  # token_iter re-raises -> 500 for non-streamed
            out.put(self._DONE)


class _Server:
    """Thin HTTP adapter; the SessionPool's registry is the single source of
    truth for session lifetime (no duplicate bookkeeping here)."""

    def __init__(self, pool: SessionPool, batch_window_s: float = 0.0,
                 continuous: bool = False, max_batch: int = 8,
                 park_idle: bool = False):
        self.pool = pool
        self.park_idle = park_idle
        if continuous:
            from .engine.sessions import ContinuousBatcher

            self.batcher = ContinuousBatcher(pool, max_batch=max_batch)
        elif batch_window_s > 0:
            self.batcher = _Batcher(pool, batch_window_s)
        else:
            self.batcher = None

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


class _StopFilter:
    """OpenAI ``stop``-sequence truncation over a token stream.

    Feed decoded token strings; emitted text never contains any stop
    sequence and generation ends the moment one completes.  A tail of
    ``max(len(stop)) - 1`` characters is held back until it can no longer
    begin a stop match (sequences may straddle token boundaries)."""

    def __init__(self, stops: list[str]):
        self.stops = [s for s in stops if s]
        self._hold = max((len(s) for s in self.stops), default=1) - 1
        self._buf = ""
        self.stopped = False

    def feed(self, token: str) -> str:
        """Returns the text safe to emit for this token ('' is common while
        the tail is held back); sets ``stopped`` when a sequence completed."""
        if not self.stops:
            return token
        self._buf += token
        cut = min((i for s in self.stops
                   if (i := self._buf.find(s)) >= 0), default=-1)
        if cut >= 0:
            self.stopped = True
            out, self._buf = self._buf[:cut], ""
            return out
        emit = len(self._buf) - self._hold
        if emit <= 0:
            return ""
        out, self._buf = self._buf[:emit], self._buf[emit:]
        return out

    def flush(self) -> str:
        """Emit the held-back tail once the stream ends without a stop."""
        out, self._buf = self._buf, ""
        return out if not self.stopped else ""


def _host_generate(srv: _Server, s, limit: int, params,
                   logprobs_top: int | None = None,
                   presence: float = 0.0, frequency: float = 0.0):
    """Per-token HOST-sampled generation for the OpenAI features the fused
    device loop doesn't carry: ``logprobs`` (needs the [V] distribution per
    step) and presence/frequency penalties (logits depend on the generated
    histogram).  Same per-token flow as the reference's own chat loop
    (minigpt4_library.py:609-657) and the pool's mirostat branch; EOS rules
    match generate_stream.  Yields (token_str, logprob, top_logprobs) where
    top_logprobs is a list of (token_str, logprob) or None."""
    from .engine.engine import MiniGPT4Engine as E

    pool = srv.pool
    nobias = params
    if params.logit_bias:
        import dataclasses

        nobias = dataclasses.replace(params, logit_bias=None)
    counts: dict[int, int] = {}
    chat = ""
    for _ in range(limit):
        if s.last_logits is None or s.n_past >= pool.fns.cfg.n_ctx:
            return
        logits = np.asarray(s.last_logits, np.float32).copy()
        for tid, b in (params.logit_bias or {}).items():
            tid = int(tid)
            if 0 <= tid < logits.size:
                logits[tid] += float(b)
        lp_dist = None
        if logprobs_top is not None:
            x = logits - logits.max()
            lp_dist = x - np.log(np.exp(x).sum())
        penalized = logits
        if counts and (presence or frequency):
            penalized = logits.copy()
            for tid, c in counts.items():
                penalized[tid] -= presence + frequency * c
        tid = s.sampler.sample(penalized, nobias)
        counts[tid] = counts.get(tid, 0) + 1
        token = pool.engine.tokenizer.id_to_str(tid)
        pool._add_tokens(s, [tid])
        chat += token
        if E.contains_eos_token(token):
            continue
        if E.is_eos(chat):
            return
        if lp_dist is not None:
            k = max(int(logprobs_top), 0)
            tops = []
            if k:
                order = np.argsort(-lp_dist, kind="stable")[:k]
                tops = [(pool.engine.tokenizer.id_to_str(int(t)),
                         float(lp_dist[t])) for t in order]
            yield token, float(lp_dist[tid]), tops
        else:
            yield token, None, None


def _generation_tokens(srv: _Server, s, limit: int, params, park: bool = True):
    """Drain one generation: through the request batcher when configured
    (device sampling only — mirostat carries host state), else the
    session's own stream; parks the session afterwards under --park-idle
    (``park=False`` for ephemeral sessions that close right after — a
    park would be a wasted host copy).  Shared by the session chat
    endpoint and /v1/chat/completions."""
    if srv.batcher is not None and params.mirostat == 0:
        out = srv.batcher.submit(s, limit, params)
        while True:
            tok = out.get()
            if tok is srv.batcher._DONE:
                break
            if isinstance(tok, Exception):
                raise tok
            yield tok
    else:
        yield from s.generate(limit=limit, params=params)
    if park and srv.park_idle:
        s.park()  # turn done: hold the KV prefix in host RAM


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
            if self.path == "/v1/models":
                # OpenAI-compatible discovery (clients probe it before chat)
                self._json(200, {"object": "list", "data": [{
                    "id": "minigpt4-tpu", "object": "model",
                    "owned_by": "minigpt4_tpu"}]})
            elif self.path == "/v1/health":
                body = {"ok": True, "sessions": srv.count(),
                        "metrics": dict(srv.pool.metrics),
                        "tok_s_30s": round(srv.pool.generation_rate(), 2),
                        "prefix_cache": srv.pool.prefix_cache_stats()}
                ppool = srv.pool.paged_pool
                if ppool is not None:  # paged-KV capacity gauges
                    body["paged"] = {
                        "free_pages": ppool.free_pages,
                        "total_pages": ppool.n_pages,
                        "broken": ppool.broken,
                        "preemptions": getattr(srv.batcher, "preemptions", 0),
                    }
                self._json(200, body)
            else:
                self._json(404, {"error": "not found"})

        def do_DELETE(self):
            m = sess_re.match(self.path)
            if m and not m.group(2):
                ok = srv.drop(int(m.group(1)))
                self._json(200 if ok else 404, {"ok": ok})
            else:
                self._json(404, {"error": "not found"})

        def _oai_parse_user(self, content):
            """OpenAI user-message content -> (text, pixels|None).  Accepts a
            plain string or the parts array; image parts must be data: URLs
            (base64) — this server fetches nothing."""
            if isinstance(content, str):
                return content, None
            text, pixels = [], None
            for part in content or []:
                if part.get("type") == "text":
                    text.append(part.get("text", ""))
                elif part.get("type") == "image_url" and pixels is None:
                    url = (part.get("image_url") or {}).get("url", "")
                    if not url.startswith("data:"):
                        raise ValueError(
                            "image_url must be a data: URL (no egress)")
                    import base64

                    from PIL import Image

                    raw = base64.b64decode(url.split(",", 1)[1])
                    img = Image.open(io.BytesIO(raw)).convert("RGB")
                    size = srv.pool.engine.vision_cfg.vit.image_size
                    pixels = image_mod.preprocess(np.asarray(img), size=size)
            return "".join(text), pixels

        def _chat_completions(self):
            """OpenAI-compatible /v1/chat/completions over an EPHEMERAL
            session: the messages array is replayed through the reference's
            Vicuna-v0 chat template (fixed system prompt, `Human:`/
            `### Assistant:` turns, first image injected as the 32-slot
            embedding), then the final user turn generates.  Stateless per
            request — multi-turn context rides in `messages`, like any
            OpenAI-style endpoint; the prefix cache absorbs the repeated
            system-prompt prefill."""
            import time as _time

            req = json.loads(self._body() or b"{}")
            messages = req.get("messages") or []
            if not messages or messages[-1].get("role") != "user":
                self._json(400, {"error": {
                    "message": "messages must end with a user turn",
                    "type": "invalid_request_error"}})
                return
            lb = {int(k): float(v)
                  for k, v in (req.get("logit_bias") or {}).items()}
            params = SamplingParams(
                temp=float(req.get("temperature", 0.8)),
                top_p=float(req.get("top_p", 0.9)),
                top_k=int(req.get("top_k", 40)),
                mirostat=int(req.get("mirostat", 0)),
                logit_bias=lb or None,
            )
            stops = req.get("stop")
            stops = ([stops] if isinstance(stops, str)
                     else list(stops or []))[:8]
            seed = req.get("seed")
            presence = float(req.get("presence_penalty") or 0.0)
            frequency = float(req.get("frequency_penalty") or 0.0)
            want_lp = bool(req.get("logprobs"))
            top_lp = int(req.get("top_logprobs") or 0)
            limit = int(req.get("max_tokens") or 256)
            stream = bool(req.get("stream", False))
            s = srv.pool.new_session()
            try:
                srv.pool.system_prompt(s)
                # replay history; the first image in any user turn becomes
                # THE image (the reference pipeline is single-image)
                have_img = False
                history = messages[:-1]
                for m in history:
                    role, content = m.get("role"), m.get("content")
                    if role == "user":
                        text, px = self._oai_parse_user(content)
                        if px is not None and not have_img:
                            s.encode_image(px)  # stores s.embedding
                            s.is_image_chat = True
                            have_img = True
                        s.ask(text)
                    elif role == "assistant":
                        # replayed replies end with the Vicuna-v0 "###"
                        # separator the live decode leaves in the KV (the
                        # EOS stays evaluated; only overshoot rolls back) —
                        # without it the next "Human:" runs into the reply
                        # and the transcript goes off-template
                        reply = (content if isinstance(content, str)
                                 else "".join(p.get("text", "")
                                              for p in (content or [])))
                        srv.pool._add_strings(s, reply + "###")
                text, px = self._oai_parse_user(messages[-1].get("content"))
                if px is not None and not have_img:
                    s.encode_image(px)
                    s.is_image_chat = True
                s.ask(text)
                # radix prefix cache: capture the fully-replayed transcript
                # BEFORE decoding — the next stateless request for this
                # conversation (same messages + the reply + one new turn)
                # then prefills only its new suffix (text-only transcripts;
                # image rows break the pure-token stream and skip)
                srv.pool.capture_prefix(s)
                prompt_tokens = s.n_past
                if seed is not None:
                    # deterministic request: reseed both samplers (host
                    # chain and the device PRNG the fused loop draws from)
                    import jax as _jax

                    s.sampler.reset(int(seed))
                    s.state.rng_key = _jax.random.PRNGKey(int(seed))
                # logprobs need the per-step [V] distribution and presence/
                # frequency penalties depend on the generated histogram:
                # both route through the per-token host path (the same loop
                # every reference client runs); everything else rides the
                # fused device loop
                host = (want_lp or presence != 0.0 or frequency != 0.0
                        or params.mirostat != 0)

                def token_iter():
                    if host:
                        yield from _host_generate(
                            srv, s, limit, params,
                            logprobs_top=top_lp if want_lp else None,
                            presence=presence, frequency=frequency)
                    else:
                        for tok in _generation_tokens(srv, s, limit, params,
                                                      park=False):
                            yield tok, None, None

                def lp_entry(tok, lp, tops):
                    return {"token": tok, "logprob": lp, "top_logprobs": [
                        {"token": t, "logprob": v} for t, v in (tops or [])]}

                rid = f"chatcmpl-{s.session_id}-{int(_time.time())}"
                model = req.get("model", "minigpt4-tpu")
                if stream:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()

                    def sse(obj):
                        data = f"data: {json.dumps(obj)}\n\n".encode()
                        self.wfile.write(
                            f"{len(data):x}\r\n".encode() + data + b"\r\n")

                    def chunk(delta, entry=None, finish=None):
                        c = {"index": 0, "delta": delta,
                             "finish_reason": finish}
                        if want_lp:
                            c["logprobs"] = (
                                {"content": [entry]} if entry else None)
                        return {"id": rid,
                                "object": "chat.completion.chunk",
                                "model": model, "choices": [c]}

                    sf = _StopFilter(stops)
                    n = 0
                    try:
                        for tok, lp, tops in token_iter():
                            n += 1
                            text = sf.feed(tok)
                            if sf.stopped:
                                if text:
                                    sse(chunk({"content": text}))
                                break
                            if text or want_lp:
                                sse(chunk(
                                    {"content": text} if text else {},
                                    lp_entry(tok, lp, tops)
                                    if want_lp else None))
                        tail = sf.flush()
                        if tail:
                            sse(chunk({"content": tail}))
                        finish = ("stop" if sf.stopped
                                  else "length" if n >= limit else "stop")
                        sse(chunk({}, finish=finish))
                        done = b"data: [DONE]\n\n"
                        self.wfile.write(
                            f"{len(done):x}\r\n".encode() + done + b"\r\n")
                    except Exception:
                        pass  # headers are out; terminate the stream
                    self.wfile.write(b"0\r\n\r\n")
                    return
                sf = _StopFilter(stops)
                parts, entries, n = [], [], 0
                for tok, lp, tops in token_iter():
                    n += 1
                    text = sf.feed(tok)
                    if text:
                        parts.append(text)
                    if sf.stopped:
                        break
                    if want_lp:
                        entries.append(lp_entry(tok, lp, tops))
                parts.append(sf.flush())
                text_out = "".join(parts)
                completion = s.n_past - prompt_tokens
                finish = ("stop" if sf.stopped
                          else "length" if n >= limit else "stop")
                choice = {
                    "index": 0,
                    "message": {"role": "assistant", "content": text_out},
                    "finish_reason": finish,
                }
                if want_lp:
                    choice["logprobs"] = {"content": entries}
                resp = {
                    "id": rid, "object": "chat.completion",
                    "created": int(_time.time()), "model": model,
                    "choices": [choice],
                    "usage": {"prompt_tokens": prompt_tokens,
                              "completion_tokens": completion,
                              "total_tokens": s.n_past},
                }
            finally:
                # close BEFORE responding: a client observing the response
                # (e.g. polling /v1/health) must never still see the
                # ephemeral session
                s.close()
            self._json(200, resp)

        def do_POST(self):
            if self.path.split("?")[0] == "/v1/chat/completions":
                try:
                    self._chat_completions()
                except Exception as e:
                    try:
                        self._json(500, {"error": {
                            "message": f"{type(e).__name__}: {e}",
                            "type": "server_error"}})
                    except Exception:
                        pass
                return
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
                    if srv.park_idle:
                        s.park()  # user is typing: free the lane's HBM
                    self._json(200, {"ok": True})
                    return
                req = json.loads(self._body() or b"{}")
                lb = {int(k): float(v)
                      for k, v in (req.get("logit_bias") or {}).items()}
                params = SamplingParams(
                    temp=float(req.get("temp", 0.8)),
                    top_k=int(req.get("top_k", 40)),
                    top_p=float(req.get("top_p", 0.9)),
                    mirostat=int(req.get("mirostat", 0)),
                    logit_bias=lb or None,
                )
                if req.get("seed") is not None:
                    import jax as _jax

                    s.sampler.reset(int(req["seed"]))
                    s.state.rng_key = _jax.random.PRNGKey(int(req["seed"]))
                limit = int(req.get("limit", 256))
                s.ask(str(req.get("message", "")))

                def token_iter():
                    return _generation_tokens(srv, s, limit, params)

                if "stream=1" in self.path:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; charset=utf-8")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    try:
                        for tok in token_iter():
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
                text = "".join(token_iter())
                self._json(200, {"text": text})
            except Exception as e:  # surface engine errors as 500s, keep serving
                if not self.wfile.closed:
                    try:
                        self._json(500, {"error": f"{type(e).__name__}: {e}"})
                    except Exception:
                        pass

    return Handler


def start_server(model_path, llm_path, host="127.0.0.1", port=8000,
                 session_ctx: int = 512, batch_window_s: float = 0.0,
                 continuous: bool = False, max_batch: int = 8,
                 park_idle: bool = False, paged_pages: int | None = None,
                 **engine_kwargs) -> ThreadingHTTPServer:
    # paged + speculative compose: verify spans route through the page
    # tables (spans crossing a page edge split inside llama._layer), so the
    # batcher keeps speculation under paging — no dense fallback needed
    pool = SessionPool(model_path, llm_path, session_ctx=session_ctx,
                       paged_pool_pages=paged_pages, **engine_kwargs)
    srv = _Server(pool, batch_window_s=batch_window_s, continuous=continuous,
                  max_batch=max_batch, park_idle=park_idle)
    httpd = ThreadingHTTPServer((host, port), make_handler(srv))
    httpd.pool = pool  # for tests / shutdown
    httpd.batcher = srv.batcher
    return httpd


def main():
    ap = argparse.ArgumentParser(description="minigpt4_tpu HTTP serving")
    ap.add_argument("model_path")
    ap.add_argument("llm_model_path")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--session-ctx", type=int, default=512)
    ap.add_argument("--n-ctx", type=int, default=2048)
    ap.add_argument(
        "--batch-window-ms", type=float, default=0.0,
        help="group concurrent generations arriving within this window into "
        "ONE batched decode (aggregate throughput scales ~linearly)",
    )
    ap.add_argument(
        "--continuous", action="store_true",
        help="continuous (in-flight) batching: requests join a RUNNING "
        "batched decode at chunk boundaries instead of waiting for the "
        "group to finish — no head-of-line blocking (takes precedence over "
        "--batch-window-ms)",
    )
    ap.add_argument(
        "--max-batch", type=int, default=8,
        help="lane count for --continuous (one stacked cache of this batch "
        "size is preallocated)",
    )
    ap.add_argument(
        "--paged-pages", type=int, default=0, metavar="N",
        help="share a paged KV pool of N 128-position pages across batched "
        "decode lanes (window groups AND --continuous): lanes cost HBM for "
        "their USED positions instead of a full session_ctx reservation, so "
        "short conversations batch far wider on one chip; under "
        "--continuous a dry pool preempts the youngest lane, which resumes "
        "once pages free (0 = dense stacked caches)",
    )
    ap.add_argument(
        "--park-idle", action="store_true",
        help="between turns, move each session's KV cache to host RAM "
        "(trimmed to its consumed prefix) and re-upload transparently on "
        "the next request — idle conversations cost 0 HBM, so far more "
        "concurrent sessions fit beside the weights",
    )
    ap.add_argument(
        "--cache-dtype", choices=["auto", "bf16", "f32", "f8"], default="auto",
        help="KV-cache storage dtype; f8 (e4m3) halves per-session cache "
        "memory (13B: ~0.2 GB instead of ~0.4 GB at session-ctx 512) so "
        "twice the sessions/batch lanes fit beside the weights",
    )
    ap.add_argument(
        "--speculative-k", type=int, default=0,
        help="greedy speculative decoding verify width, up to 32 (0 = off): "
        "n-gram drafted, block-verified — greedy output is token-identical, "
        "throughput rises with the acceptance rate; applies to single-stream "
        "AND batched (--batch-window-ms) greedy decode",
    )
    ap.add_argument(
        "--ctx-shift", action="store_true",
        help="llama.cpp-style context shift: when a session's context fills, "
        "drop its oldest turns after the system-prompt/image prefix and "
        "slide the KV cache (K rows re-rotated to their new positions) "
        "instead of stopping — conversations become unbounded in length. "
        "Applies to single-session decode and --continuous lanes (a full "
        "lane detaches, shifts, and resumes); window-batched groups still "
        "stop at the context end",
    )
    ap.add_argument(
        "--no-prefix-cache", action="store_true",
        help="disable the radix prefix KV cache (fresh sessions then "
        "recompute the SYSTEM_PROMPT prefill, and every stateless OpenAI "
        "replay re-prefills its whole conversation instead of only the "
        "new turn)",
    )
    ap.add_argument(
        "--prefix-cache-mb", type=int, default=512, metavar="MB",
        help="host-RAM budget for the radix prefix KV cache (LRU-evicted; "
        "entries are captured transcript prefixes keyed by token stream)",
    )
    ap.add_argument(
        "--draft-llm", default=None, metavar="PATH",
        help="ggml llama file of a SMALLER draft model sharing the main "
        "model's tokenizer: greedy single-stream decode is then drafted by "
        "it and block-verified by the main model (token-identical output; "
        "unlike n-gram lookup, a trained drafter accelerates novel text)",
    )
    ap.add_argument(
        "--draft-head", default=None, metavar="PATH",
        help="distilled draft-head artifact (train/draft.py, trained via "
        "its distillation CLI): a tiny decoder over the model's own "
        "embedding drafts greedy decode — no second ggml file needed",
    )
    ap.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel devices for the decoder (shard_map over a "
        "(dp, tp) mesh; greedy output is identical to single-chip)",
    )
    ap.add_argument(
        "--smooth-scales", default=None,
        help="calibration npz (python -m minigpt4_tpu.quality --save-scales) "
        "steering the w8a8 activation-quantization grids off outlier "
        "channels; ignored unless the decoder is on the w8a8 path",
    )
    args = ap.parse_args()
    from .engine.engine import CACHE_DTYPES

    httpd = start_server(args.model_path, args.llm_model_path, args.host,
                         args.port, session_ctx=args.session_ctx, n_ctx=args.n_ctx,
                         batch_window_s=args.batch_window_ms / 1e3,
                         continuous=args.continuous, max_batch=args.max_batch,
                         park_idle=args.park_idle,
                         paged_pages=args.paged_pages or None,
                         speculative_k=args.speculative_k,
                         prefix_cache=not args.no_prefix_cache,
                         prefix_cache_mb=args.prefix_cache_mb,
                         context_shift=args.ctx_shift,
                         draft_llm_path=args.draft_llm,
                         draft_head_path=args.draft_head,
                         cache_dtype=CACHE_DTYPES.get(args.cache_dtype),
                         smooth_scales=args.smooth_scales,
                         tp=args.tp)
    print(f"serving on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
