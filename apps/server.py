"""Headless serving API — the Gradio UI's capabilities over plain HTTP.

The reference's only serving surface is the Gradio app
(reference gradio_ui.py:266-344); this exposes the same session flow
(register → previews → select → add keyframe → render movie) as a JSON
API on the stdlib http.server, reusing MultiUserRouter — no gradio
dependency, embeddable behind any frontend or load balancer. The engine
compute stays safe under concurrency for the same reason the Gradio app
is: per-user sessions + per-engine locks.

    python apps/server.py --tiny --port 7861
    python apps/server.py --snapshots /path/to/sdxl-turbo [...]

Endpoints (all JSON unless noted):
  POST /session   {"model": "...", "width": W, "height": H} → {"user_id"}
  POST /previews  {"user_id", "prompt", "negative_prompt"} → {"images": [url...]}
  POST /select    {"user_id", "index"}                     → {"ok"}
  POST /keyframe  {"user_id"}                              → {"movie": [url...]}
  POST /reorder   {"user_id", "index", "direction"}        → {"movie": [url...]}
  POST /delete    {"user_id", "index"}                     → {"movie": [url...]}
  POST /movie     {"user_id", "t_per_segment": s, "loop"?}  → {"movie_url", "json_url"}
  GET  /files/<token>                                       → image/video bytes
                  (only files this server handed out resolve — no
                   directory is ever exposed)
  GET  /health                                              → {"ok", "models"}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import types
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_handler(router, file_root: str, max_tokens_per_user: int = 256):
    import collections
    import secrets

    # Only files this server itself handed out are servable: _file_url
    # registers the absolute path under an opaque RANDOM token (a
    # deterministic path hash would be precomputable by a remote client —
    # advisor r2), and GET /files/ resolves live-session tokens only.
    # Serving whole directories (cwd, the shared system temp dir) would
    # disclose unrelated files (.git, other processes' temp artifacts).
    served: dict[str, tuple[str, str]] = {}  # token -> (user_id, abspath)
    user_tokens: dict[str, collections.deque] = {}
    served_lock = threading.Lock()

    def _register(fp: str, uid: str) -> str:
        with served_lock:
            # drop registrations owned by evicted sessions (keeps the
            # registry bounded by live sessions × per-user cap)
            dead = [u for u in user_tokens if u not in router.sessions]
            for u in dead:
                for tok in user_tokens.pop(u):
                    served.pop(tok, None)
            token = secrets.token_urlsafe(18)
            served[token] = (uid, os.path.abspath(fp))
            q = user_tokens.setdefault(uid, collections.deque())
            q.append(token)
            while len(q) > max_tokens_per_user:
                served.pop(q.popleft(), None)
        return token

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _file_url(self, fp: str, uid: str) -> str:
            return f"/files/{_register(fp, uid)}"

        def do_GET(self):
            path = urllib.parse.urlparse(self.path).path
            if path == "/health":
                return self._json(200, {"ok": True, "models": router.list_models})
            if path.startswith("/files/"):
                token = urllib.parse.unquote(path[len("/files/"):])
                with served_lock:
                    entry = served.get(token)
                if entry is None or entry[0] not in router.sessions:
                    return self._json(403, {"error": "forbidden"})
                fp = entry[1]
                if not os.path.isfile(fp):
                    return self._json(404, {"error": "not found"})
                ctype = "video/mp4" if fp.endswith(".mp4") else "image/jpeg"
                with open(fp, "rb") as f:
                    data = f.read()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            return self._json(404, {"error": "not found"})

        def do_POST(self):
            path = urllib.parse.urlparse(self.path).path
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._json(400, {"error": "bad json"})
            try:
                if path == "/session":
                    model = req.get("model", router.list_models[0])
                    if model not in router.engines:
                        return self._json(400, {"error": f"unknown model {model!r}", "models": router.list_models})
                    # bound dimensions like the Gradio UI sliders (2048 max)
                    w = min(max(int(req.get("width", 512)), 64), 2048)
                    h = min(max(int(req.get("height", 512)), 64), 2048)
                    uid = router.register_new_user(model, w, h)
                    return self._json(200, {"user_id": uid})
                uid = req.get("user_id")
                if uid not in router.sessions:
                    return self._json(404, {"error": "unknown user_id"})
                if path == "/previews":
                    imgs = router.compute_imgs(uid, req.get("prompt", ""), req.get("negative_prompt", ""))
                    return self._json(200, {"images": [self._file_url(f, uid) for f in imgs]})
                if path == "/select":
                    router.preview_img_selected(uid, types.SimpleNamespace(index=int(req["index"])), None)
                    return self._json(200, {"ok": True})
                if path == "/keyframe":
                    movie = router.add_image_to_video(uid)
                    return self._json(200, {"movie": [self._file_url(f, uid) for f in movie]})
                if path == "/reorder":
                    router.movie_img_selected(uid, types.SimpleNamespace(index=int(req["index"])), None)
                    fn = router.img_movie_later if req.get("direction", "later") == "later" else router.img_movie_earlier
                    return self._json(200, {"movie": [self._file_url(f, uid) for f in fn(uid)]})
                if path == "/delete":
                    router.movie_img_selected(uid, types.SimpleNamespace(index=int(req["index"])), None)
                    return self._json(200, {"movie": [self._file_url(f, uid) for f in router.img_movie_delete(uid)]})
                if path == "/movie":
                    fp_movie = router.generate_movie(
                        uid, float(req.get("t_per_segment", 10.0)), loop=bool(req.get("loop", False))
                    )
                    s = router.sessions[uid]
                    return self._json(200, {
                        "movie_url": self._file_url(fp_movie, uid),
                        "json_url": self._file_url(s.fp_json, uid) if os.path.isfile(s.fp_json) else None,
                    })
                return self._json(404, {"error": "not found"})
            except (KeyError, ValueError, AssertionError) as e:
                return self._json(400, {"error": str(e)})

    return Handler


def serve(router, port: int = 7861, file_root: str | None = None) -> ThreadingHTTPServer:
    """Start the server on a background thread; returns the server object
    (call .shutdown() to stop). file_root is informational only — /files/
    serves exclusively the token-registered files the API handed out."""
    file_root = file_root or os.getcwd()
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(router, file_root))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


def main():
    from gradio_ui import MultiUserRouter, build_engines

    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true", help="tiny random-weight model (smoke)")
    p.add_argument("--snapshots", nargs="*", default=[], help="HF snapshot dirs to serve")
    p.add_argument("--port", type=int, default=7861)
    p.add_argument("--nmb_preview_images", type=int, default=4)
    args = p.parse_args()
    engines = build_engines(args)
    router = MultiUserRouter(engines, nmb_preview_images=args.nmb_preview_images)
    httpd = serve(router, port=args.port)
    print(f"serving on :{args.port} (models: {router.list_models})")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
