"""HTTP serving layer: transport round-trips + route logic + error paths."""

import io
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from transformer_clip_eeg_tpu.serve import InferenceSession, RetrievalIndex
from transformer_clip_eeg_tpu.server import (
    NPY_CONTENT_TYPE,
    EmbeddingService,
    ServiceError,
    make_server,
)

T, EEG_C, SP_D = 32, 64, 8


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    """A live InferenceSession over a minimal trained-run directory."""
    import jax

    from transformer_clip_eeg_tpu.serve import build_model_from_config
    from transformer_clip_eeg_tpu.train.checkpoint import save_checkpoint
    from transformer_clip_eeg_tpu.train.config import TrainConfig
    from transformer_clip_eeg_tpu.train.state import (
        init_train_state,
        make_optimizer,
    )

    root = tmp_path_factory.mktemp("server_run")
    cfg = TrainConfig(
        window_length_s=1, fs=T, attention_depth=1, latent_dim=4,
        lstm_units=8, speech_dim_override=SP_D, batch_size=4,
    )
    cfg.save(os.path.join(root, "args.txt"))
    model = build_model_from_config(cfg, bank_size=16)
    rng = np.random.default_rng(0)
    state = init_train_state(
        model, jax.random.PRNGKey(0),
        (rng.standard_normal((2, T, EEG_C)).astype(np.float32),
         rng.standard_normal((2, T, SP_D)).astype(np.float32),
         np.arange(1, 3, dtype=np.int32)),
        make_optimizer("adamw", 1e-3),
    )
    ckpt_dir = os.path.join(root, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint(ckpt_dir, state)
    return InferenceSession.from_results_dir(str(root), chunk=4)


@pytest.fixture(scope="module")
def server(session):
    """A live threaded server on an ephemeral port; yields its base URL."""
    dim = np.asarray(
        session.embed_speech(np.zeros((1, T, SP_D), np.float32))
    ).shape[1]
    service = EmbeddingService(
        session, RetrievalIndex(dim, capacity=64),
        info={"model_arch": session.cfg.model_arch},
    )
    httpd = make_server(service, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.server_close()


def _post(url, payload=None, body=None, headers=None):
    data = body if body is not None else json.dumps(payload).encode()
    req = urllib.request.Request(url, data=data, headers=headers or {})
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        ctype = resp.headers.get("Content-Type", "")
    if ctype.startswith(NPY_CONTENT_TYPE):
        return np.load(io.BytesIO(raw))
    return json.loads(raw)


def test_healthz(server, session):
    with urllib.request.urlopen(f"{server}/healthz") as resp:
        out = json.loads(resp.read())
    assert out["status"] == "ok"
    assert out["model_arch"] == session.cfg.model_arch
    assert out["index_capacity"] == 64


def test_embed_eeg_json_matches_direct(server, session):
    rng = np.random.default_rng(1)
    eeg = rng.standard_normal((3, T, EEG_C)).astype(np.float32)
    out = _post(f"{server}/v1/embed/eeg", {"windows": eeg.tolist()})
    want = np.asarray(session.embed_eeg(eeg))
    np.testing.assert_allclose(
        np.asarray(out["embeddings"], np.float32), want, rtol=1e-5, atol=1e-5
    )


def test_embed_npy_round_trip(server, session):
    """Raw .npy body in + Accept .npy out == the JSON answer."""
    rng = np.random.default_rng(2)
    speech = rng.standard_normal((2, T, SP_D)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, speech)
    out_npy = _post(
        f"{server}/v1/embed/speech", body=buf.getvalue(),
        headers={"Content-Type": NPY_CONTENT_TYPE, "Accept": NPY_CONTENT_TYPE},
    )
    out_json = _post(f"{server}/v1/embed/speech", {"windows": speech.tolist()})
    np.testing.assert_allclose(
        out_npy, np.asarray(out_json["embeddings"], np.float32),
        rtol=1e-6, atol=1e-6,
    )


def test_retrieval_add_then_topk(server, session):
    rng = np.random.default_rng(3)
    cand = rng.standard_normal((5, T, SP_D)).astype(np.float32)
    added = _post(f"{server}/v1/retrieval/add", {"windows": cand.tolist()})
    assert added["ids"] == list(range(5))

    eeg = rng.standard_normal((2, T, EEG_C)).astype(np.float32)
    out = _post(
        f"{server}/v1/retrieval/topk", {"windows": eeg.tolist(), "k": 3}
    )
    scores = np.asarray(out["scores"])
    ids = np.asarray(out["ids"])
    assert scores.shape == ids.shape == (2, 3)
    # scores sorted descending, ids within the added bank
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    assert ((ids >= 0) & (ids < 5)).all()


def test_match_mismatch_route(server, session):
    """With cand_a the true matches, decisions must equal the direct rule."""
    from transformer_clip_eeg_tpu.serve import match_mismatch_decide

    rng = np.random.default_rng(4)
    eeg = rng.standard_normal((4, T, EEG_C)).astype(np.float32)
    a = rng.standard_normal((4, T, SP_D)).astype(np.float32)
    b = rng.standard_normal((4, T, SP_D)).astype(np.float32)
    out = _post(f"{server}/v1/match_mismatch", {
        "eeg": eeg.tolist(), "cand_a": a.tolist(), "cand_b": b.tolist(),
    })
    want = match_mismatch_decide(
        np.asarray(session.embed_eeg(eeg)),
        np.asarray(session.embed_speech(a)),
        np.asarray(session.embed_speech(b)),
    )
    assert out["decisions"] == want.tolist()


def test_http_error_codes(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/v1/no/such/route", {})
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/v1/embed/eeg", {"wrong_field": [1, 2]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:  # ragged → not numeric
        _post(f"{server}/v1/embed/eeg", {"windows": [[1], [1, 2]]})
    assert e.value.code == 400


def test_404_drains_body_keepalive(server):
    """A 404 with an unread POST body must not desync HTTP/1.1 keep-alive:
    the next request on the same connection has to succeed."""
    import http.client

    host, port = server.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port))
    try:
        body = json.dumps({"windows": [[[0.0] * EEG_C] * T]}).encode()
        conn.request("POST", "/v1/nope", body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        # second, valid request on the SAME connection
        conn.request("GET", "/healthz")
        resp2 = conn.getresponse()
        assert resp2.status == 200
        assert json.loads(resp2.read())["status"] == "ok"
    finally:
        conn.close()


def test_query_param_false_disables_normalize(server, session):
    """?normalize=false must be parsed as boolean False, not a truthy
    string that silently enables MVN."""
    rng = np.random.default_rng(21)
    eeg = (3.0 + rng.standard_normal((2, T, EEG_C))).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, eeg)
    headers = {"Content-Type": NPY_CONTENT_TYPE, "Accept": NPY_CONTENT_TYPE}
    out_false = _post(f"{server}/v1/embed/eeg?normalize=false",
                      body=buf.getvalue(), headers=headers)
    out_true = _post(f"{server}/v1/embed/eeg?normalize=true",
                     body=buf.getvalue(), headers=headers)
    want_raw = np.asarray(session.embed_eeg(eeg))
    want_mvn = np.asarray(session.embed_eeg(eeg, normalize=True))
    np.testing.assert_allclose(out_false, want_raw, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_true, want_mvn, rtol=1e-5, atol=1e-5)


def test_empty_npy_body_is_400(server):
    """np.load raises EOFError on an empty body — must map to 400, not 500."""
    req = urllib.request.Request(
        f"{server}/v1/embed/eeg", data=b"",
        headers={"Content-Type": NPY_CONTENT_TYPE},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    assert "invalid .npy body" in json.loads(e.value.read())["error"]


def test_non_integer_k_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/v1/retrieval/topk",
              {"queries": [[0.0, 1.0]], "k": "abc"})
    assert e.value.code == 400
    assert "k must be an integer" in json.loads(e.value.read())["error"]


def test_malformed_query_k_is_400(server):
    """'--5' passes an isdigit() check after lstrip('-') but int() rejects
    it — must surface as 400, not a 500 from the coercion layer."""
    q = np.zeros((1, 2), np.float32)
    buf = io.BytesIO()
    np.save(buf, q)
    req = urllib.request.Request(
        f"{server}/v1/retrieval/topk?k=--5", data=buf.getvalue(),
        headers={"Content-Type": NPY_CONTENT_TYPE},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_get_with_body_keepalive(server):
    """A GET carrying a body (legal, unusual) must not desync keep-alive."""
    import http.client

    host, port = server.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port))
    try:
        conn.request("GET", "/healthz", body=b"ignored-body-bytes")
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()
        conn.request("GET", "/healthz")
        resp2 = conn.getresponse()
        assert resp2.status == 200
        assert json.loads(resp2.read())["status"] == "ok"
    finally:
        conn.close()


def test_service_without_index_rejects_retrieval(session):
    service = EmbeddingService(session, index=None)
    with pytest.raises(ServiceError) as e:
        service.retrieval_topk({"queries": [[0.0, 1.0]]})
    assert e.value.status == 400


def test_service_index_full_is_409(session):
    dim = np.asarray(
        session.embed_speech(np.zeros((1, T, SP_D), np.float32))
    ).shape[1]
    service = EmbeddingService(session, RetrievalIndex(dim, capacity=2))
    emb = np.eye(2, dim, dtype=np.float32)
    service.retrieval_add({"embeddings": emb.tolist()})
    with pytest.raises(ServiceError) as e:
        service.retrieval_add({"embeddings": emb.tolist()})
    assert e.value.status == 409


# -- dynamic micro-batching -------------------------------------------------


class _CountingSession:
    """Wraps an InferenceSession, counting device-path embed calls."""

    def __init__(self, session):
        self._session = session
        self.cfg = session.cfg
        self.eeg_calls = 0
        self.speech_calls = 0

    def embed_eeg(self, windows, normalize=False):
        self.eeg_calls += 1
        return self._session.embed_eeg(windows, normalize=normalize)

    def embed_speech(self, windows):
        self.speech_calls += 1
        return self._session.embed_speech(windows)


def test_microbatcher_coalesces_and_matches_unbatched(session):
    """K concurrent embed requests: fewer device calls, identical results."""
    counting = _CountingSession(session)
    service = EmbeddingService(counting, batch_window_ms=25.0)
    try:
        rng = np.random.default_rng(10)
        reqs = [rng.standard_normal((2, T, EEG_C)).astype(np.float32)
                for _ in range(6)]
        outs = [None] * len(reqs)

        def call(i):
            outs[i] = service.embed_eeg({"windows": reqs[i]})

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for req, out in zip(reqs, outs):
            want = np.asarray(session.embed_eeg(req))
            np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
        # 6 near-simultaneous requests within a 25 ms window must coalesce
        assert counting.eeg_calls < len(reqs), counting.eeg_calls
    finally:
        service.close()


def test_microbatcher_normalize_is_per_request(session):
    """MVN is a per-request batch statistic; batching must not mix it."""
    service = EmbeddingService(session, batch_window_ms=10.0)
    try:
        rng = np.random.default_rng(11)
        a = (5.0 + rng.standard_normal((3, T, EEG_C))).astype(np.float32)
        b = (-2.0 + 3 * rng.standard_normal((4, T, EEG_C))).astype(np.float32)
        outs = {}

        def call(name, arr):
            outs[name] = service.embed_eeg(
                {"windows": arr, "normalize": True}
            )

        threads = [threading.Thread(target=call, args=(n, x))
                   for n, x in (("a", a), ("b", b))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for name, arr in (("a", a), ("b", b)):
            want = np.asarray(session.embed_eeg(arr, normalize=True))
            np.testing.assert_allclose(
                outs[name], want, rtol=1e-5, atol=1e-5
            )
    finally:
        service.close()


def test_microbatcher_groups_by_shape(session):
    """A bad-shaped request fails alone; a good one in the same window
    succeeds (shape groups share one dispatch, not one fate)."""
    service = EmbeddingService(session, batch_window_ms=25.0)
    try:
        rng = np.random.default_rng(12)
        good = rng.standard_normal((2, T, EEG_C)).astype(np.float32)
        bad = rng.standard_normal((2, T, EEG_C - 1)).astype(np.float32)
        results = {}

        def call(name, arr):
            try:
                results[name] = service.embed_eeg({"windows": arr})
            except Exception as e:  # noqa: BLE001
                results[name] = e

        threads = [threading.Thread(target=call, args=(n, x))
                   for n, x in (("good", good), ("bad", bad))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        assert isinstance(results["bad"], Exception)
        want = np.asarray(session.embed_eeg(good))
        np.testing.assert_allclose(results["good"], want, rtol=1e-5,
                                   atol=1e-5)
    finally:
        service.close()


def test_batched_server_over_http(session):
    """End-to-end: a batching server answers concurrent HTTP clients with
    the same embeddings as the unbatched service and reports coalescing
    stats in /healthz."""
    service = EmbeddingService(session, batch_window_ms=20.0)
    httpd = make_server(service, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        rng = np.random.default_rng(13)
        reqs = [rng.standard_normal((1, T, EEG_C)).astype(np.float32)
                for _ in range(4)]
        outs = [None] * len(reqs)

        def call(i):
            outs[i] = _post(
                f"{url}/v1/embed/eeg", {"windows": reqs[i].tolist()}
            )

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for req, out in zip(reqs, outs):
            want = np.asarray(session.embed_eeg(req))
            np.testing.assert_allclose(
                np.asarray(out["embeddings"], np.float32), want,
                rtol=1e-5, atol=1e-5,
            )
        with urllib.request.urlopen(f"{url}/healthz") as resp:
            health = json.loads(resp.read())
        assert health["batching"]["requests"] >= 4
        assert health["batching"]["dispatches"] >= 1
    finally:
        httpd.shutdown()
        httpd.server_close()
        service.close()
