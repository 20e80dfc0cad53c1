#!/usr/bin/env python
"""Minimal client for the minigpt4_tpu HTTP serving API (serve.py) — stdlib
only.  Start a server first:

    python -m minigpt4_tpu.serve model.bin vicuna.bin --port 8000 \
        --continuous --speculative-k 8

then chat (optionally with an image):

    python examples/http_client.py -s http://127.0.0.1:8000 \
        -i photo.png -p "what is in this picture?" -p "what color is it?"
"""
import argparse
import json
import urllib.request


def post(base, path, data, headers=None):
    req = urllib.request.Request(base + path, data=data, method="POST",
                                 headers=headers or {})
    return urllib.request.urlopen(req, timeout=600)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--server", default="http://127.0.0.1:8000")
    ap.add_argument("-i", "--image", help="image file to upload (PNG/JPEG)")
    ap.add_argument("-p", "--prompt", action="append", required=True,
                    help="question (repeatable for multi-turn)")
    ap.add_argument("--limit", type=int, default=256)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--no-stream", action="store_true")
    args = ap.parse_args()

    with post(args.server, "/v1/sessions", b"") as r:
        sid = json.loads(r.read())["session_id"]
    print(f"[session {sid}]")

    if args.image:
        with open(args.image, "rb") as f:
            with post(args.server, f"/v1/sessions/{sid}/image", f.read()) as r:
                assert json.loads(r.read())["ok"]
        print(f"[uploaded {args.image}]")

    for q in args.prompt:
        print(f"\n> {q}")
        body = json.dumps({"message": q, "limit": args.limit,
                           "temp": args.temp}).encode()
        hdrs = {"Content-Type": "application/json"}
        if args.no_stream:
            with post(args.server, f"/v1/sessions/{sid}/chat", body, hdrs) as r:
                print(json.loads(r.read())["text"])
        else:
            with post(args.server, f"/v1/sessions/{sid}/chat?stream=1", body, hdrs) as r:
                while True:
                    chunk = r.read(64)
                    if not chunk:
                        break
                    print(chunk.decode(errors="replace"), end="", flush=True)
            print()

    req = urllib.request.Request(f"{args.server}/v1/sessions/{sid}", method="DELETE")
    urllib.request.urlopen(req, timeout=30).read()


if __name__ == "__main__":
    main()
