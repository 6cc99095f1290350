"""Generation server end-to-end: healthz, MIDI and token responses,
structure conditioning, input validation."""
import base64
import json
import threading
import urllib.request

import numpy as np
import pytest

from polyphemus_tpu.serve import serve

from .test_generate_cli import save_native_model


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    model_dir = save_native_model(tmp_path_factory.mktemp("srv"))
    httpd, svc = serve(model_dir, port=0, batch_cap=4, warmup=True)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["batch_cap"] == 4


def test_generate_midi(server):
    status, body = _post(server, {"n": 2, "seed": 5})
    assert status == 200
    assert len(body["midi_b64"]) == 2
    from polyphemus_tpu.midi.parser import read_midi
    import tempfile, os

    raw = base64.b64decode(body["midi_b64"][0])
    assert raw[:4] == b"MThd"
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.mid")
        open(path, "wb").write(raw)
        song, tpq, _ = read_midi(path)
        assert song.tracks  # parses back

    # deterministic: same seed -> same bytes; different seed -> different
    status2, body2 = _post(server, {"n": 2, "seed": 5})
    assert body2["midi_b64"] == body["midi_b64"]
    _, body3 = _post(server, {"n": 2, "seed": 6})
    assert body3["midi_b64"] != body["midi_b64"]


def test_generate_tokens_and_structure(server):
    s = np.zeros((2, 4, 32), bool)
    s[:, :, ::8] = True
    status, body = _post(server, {"n": 1, "format": "tokens",
                                  "structure": s.tolist()})
    assert status == 200
    mask = np.asarray(body["mask"], bool)
    assert mask.shape == (1, 2, 4, 32)
    np.testing.assert_array_equal(mask[0], s)
    toks = np.asarray(body["tokens"])
    assert toks.shape == (1, 2, 4, 32, 15, 2)


def test_generate_validation(server):
    status, body = _post(server, {"n": 99})
    assert status == 400
    assert "n must be" in body["error"]


def test_health_alias(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_negative_temperature_rejected(server):
    status, body = _post(server, {"n": 1, "content_temp": -0.5})
    assert status == 400
    assert "temperatures" in body["error"]


def test_temp_quantization_preserves_stochasticity():
    from polyphemus_tpu.serve import _quantize_temp

    # a positive temperature must never quantize to deterministic argmax
    assert _quantize_temp(0.004) == 0.01
    assert _quantize_temp(0.0) == 0.0
    assert _quantize_temp(0.678) == 0.68
    with pytest.raises(ValueError):
        _quantize_temp(-1.0)


def test_tiers_must_be_positive(tmp_path_factory):
    from polyphemus_tpu.serve import GenerationService

    model_dir = save_native_model(tmp_path_factory.mktemp("srv_tiers"))
    with pytest.raises(ValueError, match="tiers must be >= 1"):
        GenerationService(model_dir, batch_cap=4, tiers=[0, 4])


@pytest.fixture(scope="module")
def big_service(tmp_path_factory):
    from polyphemus_tpu.serve import GenerationService

    model_dir = save_native_model(tmp_path_factory.mktemp("srv_big"))
    svc = GenerationService(model_dir, batch_cap=32, tiers=[1, 8, 32])
    svc.warmup()
    return svc


def test_coalescer_merges_queued_requests_into_one_call(big_service):
    """Deterministic coalescing check: pre-load the queue, wake the
    dispatcher once, and the whole compatible prefix must run as a single
    device call whose per-request outputs bit-match solo calls."""
    import threading

    from polyphemus_tpu import serve as S

    svc = big_service
    solo = {seed: svc.generate(1, seed=seed) for seed in (10, 11, 12, 13)}
    key = (0.0, 0.0, False)
    works = [S._Work(key, S.host_z(seed, 1, svc.mc.d), None)
             for seed in (10, 11, 12, 13)]
    calls_before = svc.stats["device_calls"]
    # stall the dispatcher behind the condition lock while enqueueing all
    with svc._pending_cv:
        svc._pending.extend(works)
        svc._pending_cv.notify()
    for w in works:
        assert w.event.wait(120) and w.err is None
    assert svc.stats["device_calls"] == calls_before + 1  # ONE tier call
    for w, seed in zip(works, (10, 11, 12, 13)):
        np.testing.assert_array_equal(w.out[0], solo[seed][0])
        np.testing.assert_array_equal(w.out[1], solo[seed][1])


def test_concurrent_mixed_tier_clients(big_service):
    """>=8 concurrent clients with mixed n: every response matches the
    sequential same-seed result exactly (no cross-request bleed), and
    under contention at least some requests coalesce."""
    import concurrent.futures as cf

    svc = big_service
    jobs = [(1, 100), (3, 101), (1, 102), (20, 103), (1, 104),
            (3, 105), (1, 106), (1, 107), (8, 108), (1, 109)]
    expected = {seed: svc.generate(n, seed=seed) for n, seed in jobs}
    with cf.ThreadPoolExecutor(len(jobs)) as ex:
        futs = {seed: ex.submit(svc.generate, n, seed=seed)
                for n, seed in jobs}
        got = {seed: f.result(timeout=240) for seed, f in futs.items()}
    for n, seed in jobs:
        mask, toks = got[seed]
        assert mask.shape[0] == n and toks.shape[0] == n
        np.testing.assert_array_equal(mask, expected[seed][0])
        np.testing.assert_array_equal(toks, expected[seed][1])


def test_coalesce_off_still_serves(tmp_path_factory):
    from polyphemus_tpu.serve import GenerationService

    model_dir = save_native_model(tmp_path_factory.mktemp("srv_nc"))
    svc = GenerationService(model_dir, batch_cap=4, coalesce=False)
    mask, toks = svc.generate(2, seed=1)
    assert mask.shape[0] == 2 and toks.shape[0] == 2
    assert svc._dispatcher is None
