"""Online HTTP serving: a zero-dependency endpoint around a trained run.

The reference has no serving story — using a trained model means re-running
the evaluation script end to end (ref ``train_clip_final.py:558-601``).
``serve.py`` packages that workflow as a batch library; this module adds the
online deployment surface: a stdlib ``ThreadingHTTPServer`` that loads a run
directory once and streams embeddings / retrieval / match-mismatch decisions
over HTTP.  No web framework — ``http.server`` + JSON + optional raw ``.npy``
bodies are enough for a single-chip embedding service.

Endpoints::

    GET  /healthz                 -> {"status": "ok", ...model info}
    POST /v1/embed/eeg            {"windows": [N][T][64], "normalize": bool}
    POST /v1/embed/speech         {"windows": [N][T][F]}
    POST /v1/retrieval/add        {"embeddings": [N][D]} | {"windows": [N][T][F]}
    POST /v1/retrieval/topk       {"queries": [Q][D]} | {"windows": [Q][T][64]},
                                  optional "k" (default 10)
    POST /v1/match_mismatch       {"eeg": [N][T][64], "cand_a": [N][T][F],
                                  "cand_b": [N][T][F]}

Array transport: JSON nested lists by default; send
``Content-Type: application/x-npy`` with an ``np.save`` body (options moved
to query params, e.g. ``?normalize=1``/``?k=5``) for bulk traffic, and set
``Accept: application/x-npy`` to get embeddings back the same way — 4 bytes
per float instead of ~13 of JSON text.

Concurrency: the threaded server parses/encodes requests concurrently but a
single lock serializes device work — one chip, one compiled session; the
chunked embedders (``serve.InferenceSession``) keep shapes static so no
request mix can trigger a recompile while serving.

Run: ``python -m transformer_clip_eeg_tpu.server --results_folder <run dir>
[--port 8321] [--candidates bank.npy | --capacity 4096]``.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

NPY_CONTENT_TYPE = "application/x-npy"


class ServiceError(Exception):
    """Client-visible error with an HTTP status."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


class EmbeddingService:
    """Route logic, separated from HTTP plumbing for direct unit testing.

    ``index`` is optional; retrieval routes 400 without one.  All device
    work runs under one lock (single chip; the host-side JSON work is what
    the threaded server parallelizes).
    """

    def __init__(self, session, index=None, info: Optional[dict] = None):
        self.session = session
        self.index = index
        self.info = dict(info or {})
        self._lock = threading.Lock()

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _array(payload: dict, *keys: str) -> np.ndarray:
        for key in keys:
            if key in payload:
                try:
                    return np.asarray(payload[key], np.float32)
                except (TypeError, ValueError) as e:
                    raise ServiceError(400, f"field '{key}' is not a numeric "
                                           f"array: {e}")
        raise ServiceError(
            400, f"missing required field: one of {'/'.join(keys)}"
        )

    def _require_index(self):
        if self.index is None:
            raise ServiceError(
                400, "no retrieval index configured (start the server with "
                     "--candidates or --capacity)"
            )
        return self.index

    # -- routes ------------------------------------------------------------

    def healthz(self) -> dict:
        out = {"status": "ok", **self.info}
        if self.index is not None:
            out["index_size"] = int(self.index.size)
            out["index_capacity"] = int(self.index.capacity)
        return out

    def embed_eeg(self, payload: dict) -> np.ndarray:
        windows = self._array(payload, "windows")
        if windows.ndim != 3:
            raise ServiceError(400, f"windows must be [N, T, C], got "
                                    f"shape {windows.shape}")
        with self._lock:
            return np.asarray(self.session.embed_eeg(
                windows, normalize=bool(payload.get("normalize", False))
            ))

    def embed_speech(self, payload: dict) -> np.ndarray:
        windows = self._array(payload, "windows")
        if windows.ndim != 3:
            raise ServiceError(400, f"windows must be [N, T, F], got "
                                    f"shape {windows.shape}")
        with self._lock:
            return np.asarray(self.session.embed_speech(windows))

    def retrieval_add(self, payload: dict) -> dict:
        index = self._require_index()
        arr = self._array(payload, "embeddings", "windows")
        with self._lock:
            if arr.ndim == 3:  # speech windows → embed first
                arr = np.asarray(self.session.embed_speech(arr))
            elif arr.ndim != 2:
                raise ServiceError(400, "embeddings must be [N, D] (or "
                                        "windows [N, T, F])")
            try:
                ids = index.add(arr)
            except ValueError as e:  # index full / dim mismatch
                raise ServiceError(409, str(e))
        return {"ids": np.asarray(ids).tolist(), "size": int(index.size)}

    def retrieval_topk(self, payload: dict) -> dict:
        index = self._require_index()
        arr = self._array(payload, "queries", "windows")
        k = int(payload.get("k", 10))
        if k < 1:
            raise ServiceError(400, f"k must be >= 1, got {k}")
        with self._lock:
            if arr.ndim == 3:  # EEG windows → embed first
                arr = np.asarray(self.session.embed_eeg(arr))
            elif arr.ndim != 2:
                raise ServiceError(400, "queries must be [Q, D] (or "
                                        "windows [Q, T, C])")
            try:
                scores, ids = index.topk(arr, k=k)
            except ValueError as e:  # empty index
                raise ServiceError(409, str(e))
        return {"scores": scores.tolist(), "ids": ids.tolist()}

    def match_mismatch(self, payload: dict) -> dict:
        from transformer_clip_eeg_tpu.serve import match_mismatch_decide

        eeg = self._array(payload, "eeg")
        cand_a = self._array(payload, "cand_a")
        cand_b = self._array(payload, "cand_b")
        with self._lock:
            eeg_emb = np.asarray(self.session.embed_eeg(eeg))
            emb_a = np.asarray(self.session.embed_speech(cand_a))
            emb_b = np.asarray(self.session.embed_speech(cand_b))
        decisions = match_mismatch_decide(eeg_emb, emb_a, emb_b)
        return {"decisions": decisions.tolist()}


class _Handler(BaseHTTPRequestHandler):
    """HTTP plumbing: body decode (JSON / .npy), route dispatch, encode."""

    service: EmbeddingService  # set on the subclass by make_server
    protocol_version = "HTTP/1.1"

    # route -> (method name, name of the array field an .npy body fills)
    POST_ROUTES = {
        "/v1/embed/eeg": ("embed_eeg", "windows"),
        "/v1/embed/speech": ("embed_speech", "windows"),
        "/v1/retrieval/add": ("retrieval_add", "embeddings"),
        "/v1/retrieval/topk": ("retrieval_topk", "queries"),
        "/v1/match_mismatch": ("match_mismatch", None),
    }

    def log_message(self, format, *args):  # noqa: A002 — stdlib signature
        pass  # quiet by default; access logging is the proxy's job

    def _send_json(self, status: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_npy(self, arr: np.ndarray):
        buf = io.BytesIO()
        np.save(buf, arr)
        body = buf.getvalue()
        self.send_response(200)
        self.send_header("Content-Type", NPY_CONTENT_TYPE)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — stdlib casing
        if urlparse(self.path).path == "/healthz":
            self._send_json(200, self.service.healthz())
        else:
            self._send_json(404, {"error": f"no such route: {self.path}"})

    def do_POST(self):  # noqa: N802 — stdlib casing
        url = urlparse(self.path)
        route = self.POST_ROUTES.get(url.path)
        if route is None:
            self._send_json(404, {"error": f"no such route: {url.path}"})
            return
        method, npy_field = route
        try:
            payload = self._read_payload(url, npy_field)
            result = getattr(self.service, method)(payload)
        except ServiceError as e:
            self._send_json(e.status, {"error": str(e)})
            return
        except json.JSONDecodeError as e:
            self._send_json(400, {"error": f"invalid JSON body: {e}"})
            return
        if isinstance(result, np.ndarray):
            if NPY_CONTENT_TYPE in self.headers.get("Accept", ""):
                self._send_npy(result)
            else:
                self._send_json(200, {"embeddings": result.tolist()})
        else:
            self._send_json(200, result)

    def _read_payload(self, url, npy_field: Optional[str]) -> dict:
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "application/json")
        if ctype.startswith(NPY_CONTENT_TYPE):
            if npy_field is None:
                raise ServiceError(
                    400, "this route needs several arrays; use JSON"
                )
            try:
                arr = np.load(io.BytesIO(body), allow_pickle=False)
            except ValueError as e:
                raise ServiceError(400, f"invalid .npy body: {e}")
            payload: dict = {npy_field: arr}
            for key, vals in parse_qs(url.query).items():
                payload[key] = (
                    int(vals[0]) if vals[0].lstrip("-").isdigit() else vals[0]
                )
            return payload
        return json.loads(body or b"{}")


def make_server(
    service: EmbeddingService, host: str = "127.0.0.1", port: int = 8321
) -> ThreadingHTTPServer:
    """Bind a threaded HTTP server to ``service`` (``port=0`` → ephemeral)."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None) -> int:
    from transformer_clip_eeg_tpu.utils.platform import (
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()

    ap = argparse.ArgumentParser(
        description="Serve a trained run directory over HTTP"
    )
    ap.add_argument("--results_folder", type=str, required=True,
                    help="run dir with args.txt + checkpoints/")
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8321)
    ap.add_argument("--chunk", type=int, default=128,
                    help="embedder compile batch (requests are padded up)")
    ap.add_argument("--candidates", type=str, default="",
                    help=".npy of [N, T, F] speech windows to pre-embed "
                         "into the retrieval index")
    ap.add_argument("--capacity", type=int, default=0,
                    help="retrieval index capacity; 0 disables retrieval "
                         "unless --candidates is given")
    args = ap.parse_args(argv)

    from transformer_clip_eeg_tpu.serve import (
        InferenceSession,
        RetrievalIndex,
    )

    session = InferenceSession.from_results_dir(
        args.results_folder, chunk=args.chunk
    )
    index = None
    if args.candidates:
        windows = np.load(args.candidates).astype(np.float32)
        emb = np.asarray(session.embed_speech(windows))
        capacity = args.capacity or max(1024, 2 * emb.shape[0])
        index = RetrievalIndex(emb.shape[1], capacity=capacity)
        index.add(emb)
        print(f"retrieval index: {emb.shape[0]} candidates "
              f"(capacity {capacity})")
    elif args.capacity:
        dim = int(np.asarray(session.embed_eeg(
            np.zeros((1, session.cfg.window_length, 64), np.float32)
        )).shape[1])
        index = RetrievalIndex(dim, capacity=args.capacity)

    service = EmbeddingService(
        session, index,
        info={
            "model_arch": session.cfg.model_arch,
            "eeg_encoder": session.cfg.eeg_encoder,
            "speech_encoder": session.cfg.speech_encoder,
            "window_length": session.cfg.window_length,
        },
    )
    httpd = make_server(service, args.host, args.port)
    print(f"serving {args.results_folder} on "
          f"http://{args.host}:{httpd.server_address[1]}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
