#!/usr/bin/env bash
# Real-gradio webui smoke (VERDICT r2 next #7): launch webui.py against the
# ACTUAL gradio, post one image+prompt through the HTTP API, assert a
# streamed token arrives.  gradio is not installable in the zero-egress
# build environment, so this job is OPTIONAL: it exits 0 with a notice when
# gradio is absent and runs for real wherever `pip install gradio` works
# (the committed GitHub workflow installs it on the ubuntu runner).
#
# Structural wiring coverage that runs EVERYWHERE: tests/test_webui_wiring.py
# (fires webui.start()'s real event graph against a faithful Blocks fake).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

if ! python -c "import gradio" 2>/dev/null; then
  echo "[webui-smoke] gradio not installed: skipped (pip install gradio to run)"
  exit 0
fi

python - <<'EOF'
import sys, threading, time
sys.path.insert(0, "tests")
import jax
jax.config.update("jax_platforms", "cpu")

from pathlib import Path
import tempfile
import numpy as np
from PIL import Image

from fixtures import build_tiny_models
from minigpt4_tpu import webui
from minigpt4_tpu.library import MiniGPT4ChatBot

tmp = Path(tempfile.mkdtemp(prefix="webui_smoke_"))
model, llm = build_tiny_models(tmp)
webui._state["bot"] = MiniGPT4ChatBot(str(model), str(llm))

# launch non-blocking: gradio Blocks.launch(prevent_thread_lock=True)
import gradio as gr
launched = {}
orig_launch = gr.Blocks.launch
def patched(self, *a, **kw):
    kw.update(prevent_thread_lock=True, quiet=True, share=False)
    launched["demo"] = self
    return orig_launch(self, *a, **kw)
gr.Blocks.launch = patched
webui.start(share=False)
demo = launched["demo"]
url = demo.local_url
print(f"[webui-smoke] launched at {url}")

from gradio_client import Client
img = tmp / "img.png"
Image.fromarray(np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                dtype=np.uint8)).save(img)
client = Client(url)
# the event graph: upload (fn_index of upload_button.click), then chat
r1 = client.predict(str(img), [], api_name=None, fn_index=1)
r2 = client.predict("what is this?", [], fn_index=0)   # user()
out = client.predict(r2[1], 8, 0.0, 40, 0.95, 1.1, fn_index=2)  # chat stream
hist = out[0]
assert hist and isinstance(hist[-1][1], str) and hist[-1][1], hist
print(f"[webui-smoke] streamed reply: {hist[-1][1]!r}")
demo.close()
print("[webui-smoke] PASS")
EOF
