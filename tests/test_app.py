"""Demo-app launch test (reference app.py:1-211 — SURVEY E5).

Boots the stdlib fallback server from app.py against the tiny random-init
T2I pipeline, asserts the control-surface DOM, and drives one generate
round-trip through the HTTP layer (prompt -> base64 PNG gallery)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def demo_server():
    from tests.test_t2i_pipeline import StubTokenizer, _tiny_bundle

    import app as app_mod
    from bitdance_tpu.pipelines.t2i import T2IPipeline

    pipe = T2IPipeline(_tiny_bundle(parallel_num=4), tokenizer=StubTokenizer(),
                       force_one_program=True)
    srv = app_mod.make_fallback_server(pipe, port=0,
                                       resolutions=["16x16", "16x32"])
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_index_dom(demo_server):
    html = urllib.request.urlopen(demo_server + "/", timeout=30).read(
        ).decode()
    # the reference demo's control surface (app.py:168-195): prompt box,
    # resolution dropdown, steps/cfg/images/seed, generate button, gallery
    for needle in ('id="prompt"', 'id="resolution"', 'id="steps"',
                   'id="cfg"', 'id="num_images"', 'id="seed"',
                   'id="generate"', 'id="gallery"',
                   '<option value="16x16"', '<option value="16x32"'):
        assert needle in html, f"missing {needle}"


def test_default_resolutions_are_the_18_buckets():
    import app as app_mod
    from bitdance_tpu.data.special_tokens import IMAGE_SIZE_LIST

    srv = app_mod.make_fallback_server(object(), port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.server_address[1]}/",
            timeout=30).read().decode()
    finally:
        srv.shutdown()
    assert html.count("<option") == len(IMAGE_SIZE_LIST) == 18
    assert '<option value="1024x1024" selected>' in html


def test_generate_roundtrip(demo_server):
    from PIL import Image

    req = json.dumps({
        "prompt": "a red cube on a blue sphere", "resolution": "16x16",
        "steps": 2, "cfg": 2.0, "num_images": 1, "seed": 7,
    }).encode()
    r = urllib.request.urlopen(urllib.request.Request(
        demo_server + "/generate", data=req,
        headers={"Content-Type": "application/json"}), timeout=600)
    out = json.loads(r.read())
    assert not out.get("error"), out.get("error")
    assert len(out["images"]) == 1
    img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
    arr = np.asarray(img)
    assert arr.shape == (16, 16, 3)
    assert arr.dtype == np.uint8
