"""HTTP serving API (apps/server.py): the full session flow over a real
socket — register → previews → select → keyframe ×2 → movie → download."""
import json
import os
import sys
import urllib.request

import jax.numpy as jnp
import pytest

_ROUTER = None  # set by the server fixture (used to reach session state)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sys.path.insert(0, "apps")
    import gradio_ui as G
    import server as S

    from latentblending_tpu.engine.blending import BlendingEngine
    from latentblending_tpu.runtime.holder import SDXLHolder

    workdir = tmp_path_factory.mktemp("srv")
    cwd = os.getcwd()
    os.chdir(workdir)
    dh = SDXLHolder.from_random("tiny-turbo", seed=0, dtype=jnp.float32)
    be = BlendingEngine(dh, run_benchmark=False)
    be.set_branching(nmb_max_branches=2)
    router = G.MultiUserRouter({"tiny-turbo": be}, nmb_preview_images=2)
    global _ROUTER
    _ROUTER = router
    httpd = S.serve(router, port=0, file_root=str(workdir))
    # port=0 → OS-assigned; read it back
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    os.chdir(cwd)


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return r.read(), r.headers.get("Content-Type")


def test_health(server):
    body, _ = _get(server, "/health")
    data = json.loads(body)
    assert data["ok"] and "tiny-turbo" in data["models"]


def test_full_session_flow(server):
    uid = _post(server, "/session", {"model": "tiny-turbo", "width": 128, "height": 128})["user_id"]

    r = _post(server, "/previews", {"user_id": uid, "prompt": "a forest", "negative_prompt": ""})
    assert len(r["images"]) == 2
    img_bytes, ctype = _get(server, r["images"][0])
    assert ctype == "image/jpeg" and len(img_bytes) > 100

    _post(server, "/select", {"user_id": uid, "index": 0})
    movie = _post(server, "/keyframe", {"user_id": uid})["movie"]
    assert len(movie) == 1

    r = _post(server, "/previews", {"user_id": uid, "prompt": "a city", "negative_prompt": ""})
    _post(server, "/select", {"user_id": uid, "index": 1})
    movie = _post(server, "/keyframe", {"user_id": uid})["movie"]
    assert len(movie) == 2

    r = _post(server, "/movie", {"user_id": uid, "t_per_segment": 1.0})
    vid, ctype = _get(server, r["movie_url"])
    assert ctype == "video/mp4" and len(vid) > 1000
    assert r["json_url"]  # session JSON written alongside


def test_unknown_user_404(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/previews", {"user_id": "nope", "prompt": "x"})
    assert e.value.code == 404


def test_file_escape_forbidden(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/files/../../etc/passwd")
    assert e.value.code in (400, 403, 404)


def test_unknown_model_400(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/session", {"model": "bogus"})
    assert e.value.code == 400


def test_unregistered_file_token_403(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/files/deadbeefdeadbeefdeadbeef")
    assert e.value.code == 403


def test_tokens_are_random_not_path_hashes(server):
    """A remote client must not be able to precompute tokens from paths
    (advisor r2): the old sha256(abspath)[:24] token of a served file must
    NOT resolve, and re-registering the same file yields a fresh URL."""
    import hashlib
    import urllib.error

    uid = _post(server, "/session", {"model": "tiny-turbo", "width": 128, "height": 128})["user_id"]
    r = _post(server, "/previews", {"user_id": uid, "prompt": "a beach", "negative_prompt": ""})
    url = r["images"][0]
    fp = _ROUTER.sessions[uid].list_images_preview[0]
    hash_token = hashlib.sha256(os.path.abspath(fp).encode()).hexdigest()[:24]
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, f"/files/{hash_token}")
    assert e.value.code == 403
    # second registration of the same prompt/session yields different URLs
    r2 = _post(server, "/previews", {"user_id": uid, "prompt": "a beach", "negative_prompt": ""})
    assert url != r2["images"][0]


def test_evicted_session_tokens_stop_resolving(server):
    import urllib.error

    uid = _post(server, "/session", {"model": "tiny-turbo", "width": 128, "height": 128})["user_id"]
    r = _post(server, "/previews", {"user_id": uid, "prompt": "a cave", "negative_prompt": ""})
    url = r["images"][0]
    _get(server, url)  # resolves while the session lives
    _ROUTER.sessions.pop(uid)  # what user_overflow_protection does
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, url)
    assert e.value.code == 403
