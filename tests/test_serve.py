"""HTTP serving layer (stdlib http.server over SessionPool)."""

import pytest

pytestmark = pytest.mark.slow  # serving/speculation suite (see conftest)

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from fixtures import build_tiny_models
from minigpt4_tpu.serve import start_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("srv"))
    httpd = start_server(model, llm, port=0, session_ctx=256, n_ctx=256, n_batch=32)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()
    httpd.pool.close()


def _post(base, path, data=b"", headers=None):
    req = urllib.request.Request(base + path, data=data, method="POST",
                                 headers=headers or {})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=120) as r:
        return r.status, r.read()


def test_health(server):
    with urllib.request.urlopen(server + "/v1/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] is True
    assert "tok_s_30s" in h  # trailing-window throughput gauge


def test_session_image_chat_roundtrip(server):
    st, body = _post(server, "/v1/sessions")
    sid = json.loads(body)["session_id"]

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    st, body = _post(server, f"/v1/sessions/{sid}/image", buf.getvalue())
    assert st == 200 and json.loads(body)["ok"]

    st, body = _post(
        server, f"/v1/sessions/{sid}/chat",
        json.dumps({"message": "what is this?", "limit": 6, "temp": 0.0}).encode(),
        {"Content-Type": "application/json"},
    )
    assert st == 200
    assert isinstance(json.loads(body)["text"], str)

    # streaming variant
    st, body = _post(
        server, f"/v1/sessions/{sid}/chat?stream=1",
        json.dumps({"message": "and?", "limit": 4, "temp": 0.0}).encode(),
    )
    assert st == 200  # chunked body decoded by urllib
    assert isinstance(body.decode(), str)

    req = urllib.request.Request(f"{server}/v1/sessions/{sid}", method="DELETE")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["ok"]


def test_concurrent_sessions(server):
    texts = {}

    def run(name):
        _, body = _post(server, "/v1/sessions")
        sid = json.loads(body)["session_id"]
        _, body = _post(
            server, f"/v1/sessions/{sid}/chat",
            json.dumps({"message": "hello", "limit": 5, "temp": 0.0}).encode(),
        )
        texts[name] = json.loads(body)["text"]

    ts = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(texts) == 3
    assert len(set(texts.values())) == 1  # same prompt, same greedy text


def test_unknown_session_404(server):
    try:
        _post(server, "/v1/sessions/9999/chat", b"{}")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404



def test_continuous_serving(tmp_path_factory):
    """--continuous: staggered requests join the running batched decode and
    match greedy outputs of sequential requests."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("csrv"))
    httpd = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                         n_batch=32, continuous=True, max_batch=2,
                         speculative_k=4)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        texts = {}

        def run(name, msg):
            _, body = _post(base, "/v1/sessions")
            sid = json.loads(body)["session_id"]
            _, body = _post(
                base, f"/v1/sessions/{sid}/chat",
                json.dumps({"message": msg, "limit": 6, "temp": 0.0}).encode(),
            )
            texts[name] = json.loads(body)["text"]

        ts = [threading.Thread(target=run, args=(i, f"prompt {i}")) for i in range(3)]
        for x in ts:
            x.start()
        for x in ts:
            x.join()
        assert len(texts) == 3

        for i in range(3):  # sequential requests reproduce the same text
            run(f"again{i}", f"prompt {i}")
            assert texts[f"again{i}"] == texts[i]
    finally:
        httpd.batcher.close()
        httpd.shutdown()
        httpd.pool.close()


@pytest.mark.parametrize("spec_k", [0, 4])
def test_batched_serving(tmp_path_factory, spec_k):
    """--batch-window groups concurrent generations into one batched decode;
    results match the unbatched server — with and without speculative
    decoding (spec_k>0 routes greedy groups through the batched
    speculative-verify path)."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp(f"bsrv{spec_k}"))
    httpd = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                         n_batch=32, batch_window_s=0.2, speculative_k=spec_k)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        texts = {}

        def run(name, msg):
            _, body = _post(base, "/v1/sessions")
            sid = json.loads(body)["session_id"]
            _, body = _post(
                base, f"/v1/sessions/{sid}/chat",
                json.dumps({"message": msg, "limit": 6, "temp": 0.0}).encode(),
            )
            texts[name] = json.loads(body)["text"]

        ts = [threading.Thread(target=run, args=(i, f"prompt {i}")) for i in range(3)]
        for x in ts:
            x.start()
        for x in ts:
            x.join()
        assert len(texts) == 3

        # same prompts unbatched, per-session, must match greedily
        for i in range(3):
            _, body = _post(base, "/v1/sessions")
            sid = json.loads(body)["session_id"]
            # fresh session decoded alone still goes through the batcher
            # (group of one) — a second source of the same text
            _, body = _post(
                base, f"/v1/sessions/{sid}/chat",
                json.dumps({"message": f"prompt {i}", "limit": 6, "temp": 0.0}).encode(),
            )
            assert json.loads(body)["text"] == texts[i]
    finally:
        httpd.shutdown()
        httpd.pool.close()

def test_paged_batched_serving(tmp_path_factory):
    """Window-batched serving over the shared KV page pool (+ park-idle, so
    admission also exercises the unpark path) matches dense serving."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("pgsrv"))
    httpd = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                         n_batch=32, batch_window_s=0.2, paged_pages=8,
                         park_idle=True)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        texts = {}

        def run(name, msg):
            _, body = _post(base, "/v1/sessions")
            sid = json.loads(body)["session_id"]
            _, body = _post(
                base, f"/v1/sessions/{sid}/chat",
                json.dumps({"message": msg, "limit": 6, "temp": 0.0}).encode(),
            )
            texts[name] = json.loads(body)["text"]

        ts = [threading.Thread(target=run, args=(i, f"prompt {i}")) for i in range(3)]
        for x in ts:
            x.start()
        for x in ts:
            x.join()
        assert len(texts) == 3
        assert httpd.pool.paged_pool.free_pages == 8  # all pages returned
        health = json.loads(_get(base, "/v1/health")[1])
        assert health["paged"] == {"free_pages": 8, "total_pages": 8,
                                   "broken": False, "preemptions": 0}

        # dense reference server: identical greedy texts
        httpd2 = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                              n_batch=32)
        t2 = threading.Thread(target=httpd2.serve_forever, daemon=True)
        t2.start()
        base2 = f"http://127.0.0.1:{httpd2.server_address[1]}"
        try:
            for i in range(3):
                _, body = _post(base2, "/v1/sessions")
                sid = json.loads(body)["session_id"]
                _, body = _post(
                    base2, f"/v1/sessions/{sid}/chat",
                    json.dumps({"message": f"prompt {i}", "limit": 6,
                                "temp": 0.0}).encode(),
                )
                assert json.loads(body)["text"] == texts[i]
        finally:
            httpd2.shutdown()
            httpd2.pool.close()
    finally:
        httpd.shutdown()
        httpd.pool.close()


def test_park_idle_serving(tmp_path_factory):
    """With --park-idle, sessions hold no device cache between turns yet
    multi-turn chat works identically (transparent unpark per request)."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("park"))
    httpd = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                         n_batch=32, park_idle=True)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        st, body = _post(base, "/v1/sessions")
        sid = json.loads(body)["session_id"]
        st, body = _post(
            base, f"/v1/sessions/{sid}/chat",
            json.dumps({"message": "hello", "limit": 4, "temp": 0.0}).encode(),
        )
        assert st == 200
        first = json.loads(body)["text"]
        s = httpd.pool._sessions[sid]
        assert s.state.cache is None and s.state.parked is not None
        st, body = _post(
            base, f"/v1/sessions/{sid}/chat",
            json.dumps({"message": "and?", "limit": 4, "temp": 0.0}).encode(),
        )
        assert st == 200
        assert isinstance(json.loads(body)["text"], str)
        assert s.state.cache is None and s.state.parked is not None

        # the reference flow: never-parked pool gives the same text
        httpd2 = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                              n_batch=32)
        t2 = threading.Thread(target=httpd2.serve_forever, daemon=True)
        t2.start()
        base2 = f"http://127.0.0.1:{httpd2.server_address[1]}"
        try:
            st, body = _post(base2, "/v1/sessions")
            sid2 = json.loads(body)["session_id"]
            st, body = _post(
                base2, f"/v1/sessions/{sid2}/chat",
                json.dumps({"message": "hello", "limit": 4, "temp": 0.0}).encode(),
            )
            assert json.loads(body)["text"] == first
        finally:
            httpd2.shutdown()
            httpd2.pool.close()
    finally:
        httpd.shutdown()
        httpd.pool.close()


def test_paged_continuous_with_spec(tmp_path_factory):
    """Paged continuous serving composes with speculation: greedy verify
    passes run over the page pool (spans crossing a page edge split inside
    the model), and responses match a dense speculative server."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("pgspec"))

    def post_slow(base, path, data=b""):
        # first paged-spec dispatch cold-compiles (interpret-mode flash
        # kernel on CPU CI): allow well past _post's default 120 s
        req = urllib.request.Request(base + path, data=data, method="POST")
        with urllib.request.urlopen(req, timeout=420) as r:
            return r.status, r.read()

    def run_server(paged_pages):
        httpd = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                             n_batch=32, continuous=True, paged_pages=paged_pages,
                             speculative_k=4)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            _, body = post_slow(base, "/v1/sessions")
            sid = json.loads(body)["session_id"]
            _, body = post_slow(
                base, f"/v1/sessions/{sid}/chat",
                json.dumps({"message": "one two one", "limit": 8,
                            "temp": 0.0}).encode(),
            )
            return json.loads(body)["text"]
        finally:
            if httpd.batcher is not None:
                httpd.batcher.close()
            httpd.shutdown()
            httpd.pool.close()

    got = run_server(8)
    want = run_server(None)
    assert got == want


# ---------------------------------------------------------------------------
# OpenAI-compatible /v1/chat/completions (ephemeral sessions over the
# reference's Vicuna-v0 chat template)
# ---------------------------------------------------------------------------

def test_openai_chat_completions(tmp_path_factory):
    model, llm = build_tiny_models(tmp_path_factory.mktemp("oai"))
    httpd = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                         n_batch=32)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        # model discovery
        _, body = _get(base, "/v1/models")
        assert json.loads(body)["data"][0]["id"] == "minigpt4-tpu"

        def chat(messages, **kw):
            _, body = _post(base, "/v1/chat/completions", json.dumps(
                {"messages": messages, "temperature": 0.0, "max_tokens": 8,
                 **kw}).encode())
            return json.loads(body)

        r = chat([{"role": "user", "content": "hello there"}])
        assert r["object"] == "chat.completion"
        assert r["choices"][0]["message"]["role"] == "assistant"
        text1 = r["choices"][0]["message"]["content"]
        assert isinstance(text1, str)
        u = r["usage"]
        assert u["prompt_tokens"] > 0
        assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
        assert r["choices"][0]["finish_reason"] in ("stop", "length")

        # stateless determinism: the same request reproduces the same text
        r2 = chat([{"role": "user", "content": "hello there"}])
        assert r2["choices"][0]["message"]["content"] == text1

        # multi-turn replay: history changes the continuation deterministically
        r3 = chat([
            {"role": "user", "content": "hello there"},
            {"role": "assistant", "content": text1},
            {"role": "user", "content": "and then?"},
        ])
        assert isinstance(r3["choices"][0]["message"]["content"], str)

        # ephemeral sessions must not leak
        _, body = _get(base, "/v1/health")
        assert json.loads(body)["sessions"] == 0

        # messages must end with a user turn
        req = urllib.request.Request(
            base + "/v1/chat/completions",
            data=json.dumps({"messages": [
                {"role": "assistant", "content": "hi"}]}).encode(),
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=120)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.pool.close()


def test_openai_chat_completions_stream_and_image(tmp_path_factory):
    import base64

    from PIL import Image

    model, llm = build_tiny_models(tmp_path_factory.mktemp("oai_s"))
    httpd = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                         n_batch=32)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        buf = io.BytesIO()
        arr = np.random.default_rng(0).integers(0, 255, (40, 40, 3),
                                                dtype=np.uint8)
        Image.fromarray(arr).save(buf, format="PNG")
        data_url = ("data:image/png;base64," +
                    base64.b64encode(buf.getvalue()).decode())
        msgs = [{"role": "user", "content": [
            {"type": "text", "text": "what is in the picture?"},
            {"type": "image_url", "image_url": {"url": data_url}},
        ]}]
        req = urllib.request.Request(
            base + "/v1/chat/completions",
            data=json.dumps({"messages": msgs, "temperature": 0.0,
                             "max_tokens": 6, "stream": True}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            events = [ln for ln in r.read().decode().split("\n\n")
                      if ln.startswith("data: ")]
        assert events[-1] == "data: [DONE]"
        chunks = [json.loads(e[6:]) for e in events[:-1]]
        assert all(c["object"] == "chat.completion.chunk" for c in chunks)
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")

        # non-stream with the same image reproduces the streamed text
        _, body = _post(base, "/v1/chat/completions", json.dumps(
            {"messages": msgs, "temperature": 0.0, "max_tokens": 6}).encode())
        assert json.loads(body)["choices"][0]["message"]["content"] == text

        # non-data URLs are refused (no egress from the server)
        bad = [{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": "http://example.com/x.png"}}]}]
        req = urllib.request.Request(
            base + "/v1/chat/completions",
            data=json.dumps({"messages": bad}).encode(), method="POST")
        try:
            urllib.request.urlopen(req, timeout=120)
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        httpd.shutdown()
        httpd.pool.close()


def test_stop_filter_straddles_token_boundaries():
    """Stop sequences split across tokens are caught; held-back tails flush
    when no stop ever completes."""
    from minigpt4_tpu.serve import _StopFilter

    sf = _StopFilter(["XY"])
    assert sf.feed("aX") == "a"        # tail 'X' held back
    assert sf.feed("Yb") == ""         # 'XY' completed across the boundary
    assert sf.stopped
    assert sf.flush() == ""            # nothing after a stop

    sf = _StopFilter(["QQ"])
    assert sf.feed("ab") == "a"
    assert sf.feed("c") == "b"
    assert sf.flush() == "c" and not sf.stopped

    sf = _StopFilter([])               # no stops: pass-through
    assert sf.feed("xyz") == "xyz" and sf.flush() == ""


def test_openai_stop_seed_bias_logprobs_penalties(tmp_path_factory):
    """The OpenAI knobs beyond the round-1 surface: stop sequences
    (truncation + finish_reason), seed (deterministic stochastic sampling),
    logit_bias (device-applied; greedy argmaxes the biased logits),
    logprobs/top_logprobs (host per-token path, greedy-identical tokens)
    and presence/frequency penalties (host path)."""
    model, llm = build_tiny_models(tmp_path_factory.mktemp("oai_p"))
    httpd = start_server(model, llm, port=0, session_ctx=256, n_ctx=256,
                         n_batch=32)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        def chat(**kw):
            _, body = _post(base, "/v1/chat/completions", json.dumps(
                {"messages": [{"role": "user", "content": "hello there"}],
                 "max_tokens": 8, **kw}).encode())
            return json.loads(body)

        r0 = chat(temperature=0.0)
        text0 = r0["choices"][0]["message"]["content"]
        assert isinstance(text0, str) and text0

        # --- stop: a substring of the greedy text truncates the reply
        stop = text0[1:3] if len(text0) >= 3 else text0
        r = chat(temperature=0.0, stop=stop)
        t = r["choices"][0]["message"]["content"]
        assert stop not in t
        assert text0.startswith(t)
        assert r["choices"][0]["finish_reason"] == "stop"
        # streamed variant produces the same truncated text
        req = urllib.request.Request(
            base + "/v1/chat/completions",
            data=json.dumps({"messages": [
                {"role": "user", "content": "hello there"}],
                "temperature": 0.0, "max_tokens": 8, "stop": stop,
                "stream": True}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            events = [ln for ln in resp.read().decode().split("\n\n")
                      if ln.startswith("data: ") and ln != "data: [DONE]"]
        chunks = [json.loads(e[6:]) for e in events]
        streamed = "".join(c["choices"][0]["delta"].get("content", "")
                           for c in chunks)
        assert streamed == t
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"

        # --- seed: identical seeded stochastic requests reproduce exactly
        a = chat(temperature=0.9, seed=7)
        b = chat(temperature=0.9, seed=7)
        assert (a["choices"][0]["message"]["content"]
                == b["choices"][0]["message"]["content"])

        # --- logit_bias: a huge bias at temp 0 forces that token every step
        tokenizer = httpd.pool.engine.tokenizer
        tid = next(i for i in range(8, 256)
                   if (t := tokenizer.id_to_str(i))
                   and "#" not in t and t != "</s>")
        r = chat(temperature=0.0, max_tokens=4,
                 logit_bias={str(tid): 1000.0})
        assert (r["choices"][0]["message"]["content"]
                == tokenizer.id_to_str(tid) * 4)

        # --- logprobs: host path, token-identical to device greedy, entries
        # carry the chosen logprob and sorted top alternatives
        r = chat(temperature=0.0, logprobs=True, top_logprobs=3)
        assert r["choices"][0]["message"]["content"] == text0
        entries = r["choices"][0]["logprobs"]["content"]
        assert entries
        for e in entries:
            assert e["logprob"] <= 1e-6
            assert len(e["top_logprobs"]) == 3
            # greedy: the chosen token IS the top-1 alternative
            assert e["top_logprobs"][0]["token"] == e["token"]
            assert e["top_logprobs"][0]["logprob"] >= e["top_logprobs"][1]["logprob"]

        # --- presence/frequency penalties run (host path) and complete
        r = chat(temperature=0.0, presence_penalty=1.5, frequency_penalty=0.5)
        assert isinstance(r["choices"][0]["message"]["content"], str)

        # ephemeral sessions never leak, whichever path served
        _, body = _get(base, "/v1/health")
        assert json.loads(body)["sessions"] == 0
    finally:
        httpd.shutdown()
        httpd.pool.close()
