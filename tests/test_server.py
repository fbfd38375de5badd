"""HTTP server integration: health, generate, streaming, batching, errors."""
import base64
import io
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _b64img(seed=0):
    buf = io.BytesIO()
    Image.fromarray(
        np.random.RandomState(seed).randint(0, 255, (32, 40, 3), np.uint8)
    ).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def server():
    port = 8941
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "server.py", "--demo", "--only_cpu",
         "--port", str(port), "--batch_window_ms", "300"],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 240
    while time.time() < deadline:
        try:
            urllib.request.urlopen(base + "/healthz", timeout=5)
            break
        except (urllib.error.URLError, socket.timeout, ConnectionError):
            if proc.poll() is not None:
                raise RuntimeError(proc.stderr.read().decode()[-2000:])
            time.sleep(2)
    else:
        proc.kill()
        raise TimeoutError("server did not come up")
    yield base
    proc.kill()


def _post(base, path, body, timeout=180):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=timeout)


def test_healthz_and_index(server):
    health = json.loads(urllib.request.urlopen(server + "/healthz").read())
    assert health["status"] == "ok"
    page = urllib.request.urlopen(server + "/").read().decode()
    assert "PaliGemma Analyzer" in page and "/generate_stream" in page
    # The UI surfaces registered adapters (populated from /healthz).
    assert 'id="adapter"' in page and "/healthz" in page


def test_generate_batched(server):
    results = [None, None]

    def worker(i):
        r = _post(server, "/generate",
                  {"prompt": f"q{i}", "image_b64": _b64img(i), "max_tokens": 4})
        results[i] = json.loads(r.read())

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    for i, r in enumerate(results):
        assert r["text"].startswith(f"q{i}")
        assert r["batched_with"] >= 1


def test_generate_stream(server):
    r = _post(server, "/generate_stream",
              {"prompt": "s", "image_b64": _b64img(5), "max_tokens": 20})
    assert r.headers["Content-Type"].startswith("text/event-stream")
    events = []
    for line in r:
        line = line.decode().strip()
        if line.startswith("data: "):
            events.append(json.loads(line[6:]))
    assert events[-1] == {"done": True, "num_tokens": 20}
    assert sum(len(e.get("tokens", [])) for e in events[:-1]) == 20


def test_bad_requests(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/generate", {"prompt": "no image"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/nope", {})
    assert e.value.code == 404


@pytest.fixture(scope="module")
def continuous_server(tmp_path_factory):
    port = 8957
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    # Save a tiny adapter for the multi-tenant LoRA surface (--adapter).
    adir = str(tmp_path_factory.mktemp("adapter"))
    import jax

    from paligemma_tpu.config import tiny_config
    from paligemma_tpu.lora import LoraConfig, init_lora, save_checkpoint_robust

    lcfg = LoraConfig(r=2, alpha=4, dropout=0.0)
    ad = init_lora(tiny_config(), lcfg, jax.random.PRNGKey(9))
    save_checkpoint_robust(ad, lcfg, adir, step=0)

    proc = subprocess.Popen(
        [sys.executable, "server.py", "--demo", "--only_cpu",
         "--port", str(port), "--continuous", "--n_slots", "2",
         "--max_new_cap", "32", "--adapter", f"fin={adir}"],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 240
    while time.time() < deadline:
        try:
            urllib.request.urlopen(base + "/healthz", timeout=5)
            break
        except (urllib.error.URLError, socket.timeout, ConnectionError):
            if proc.poll() is not None:
                raise RuntimeError(proc.stderr.read().decode()[-2000:])
            time.sleep(2)
    else:
        proc.kill()
        raise TimeoutError("continuous server did not come up")
    yield base
    proc.kill()


def test_continuous_concurrent_mixed_lengths(continuous_server):
    """Concurrent requests with different max_tokens join the running decode
    and each gets its own complete greedy answer (identical to what the same
    prompt yields when sent alone)."""
    base = continuous_server
    results = {}

    def worker(i, max_tokens):
        body = {"prompt": f"describe item {i}", "image_b64": _b64img(i),
                "max_tokens": max_tokens}
        with _post(base, "/generate", body) as r:
            results[i] = json.loads(r.read())

    threads = [threading.Thread(target=worker, args=(i, mt))
               for i, mt in enumerate([6, 14, 10])]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert set(results) == {0, 1, 2}
    for i, mt in enumerate([6, 14, 10]):
        assert results[i]["continuous"] is True
        assert 1 <= results[i]["num_tokens"] <= mt

    # Output identity vs single-stream: re-send request 1 alone.
    with _post(base, "/generate",
               {"prompt": "describe item 1", "image_b64": _b64img(1),
                "max_tokens": 14}) as r:
        solo = json.loads(r.read())
    assert solo["tokens"] == results[1]["tokens"]


def test_continuous_concurrent_streams(continuous_server):
    """Two SSE streams run CONCURRENTLY over the continuous slots (they no
    longer serialize on the engine lock) and each re-streamed alone yields
    the same greedy tokens."""
    base = continuous_server
    results = {}

    def stream(i, max_tokens):
        body = {"prompt": f"stream {i}", "image_b64": _b64img(i + 10),
                "max_tokens": max_tokens}
        req = urllib.request.Request(
            base + "/generate_stream", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        toks = []
        with urllib.request.urlopen(req, timeout=180) as r:
            for line in r:
                line = line.decode().strip()
                if not line.startswith("data: "):
                    continue
                evt = json.loads(line[len("data: "):])
                if evt.get("done"):
                    break
                toks.extend(evt["tokens"])
        results[i] = toks

    threads = [threading.Thread(target=stream, args=(i, 10)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert set(results) == {0, 1}
    assert all(1 <= len(v) <= 10 for v in results.values())

    solo = dict(results)
    results.clear()
    stream(0, 10)
    assert results[0] == solo[0]


def test_continuous_stream_join_error_surfaces(continuous_server):
    """A stream whose prompt exceeds the slot prompt budget must surface an
    error — not a silent empty 200 stream."""
    base = continuous_server
    body = {"prompt": "x" * 4000, "image_b64": _b64img(3), "max_tokens": 4}
    req = urllib.request.Request(
        base + "/generate_stream", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = r.read().decode()
        assert False, f"expected an error, got: {payload[:200]}"
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "prompt" in e.read().decode()


def test_continuous_adapter_roundtrip(continuous_server):
    """Multi-tenant LoRA over HTTP: healthz lists registered adapters, a
    request selecting one succeeds, an unknown name is a 400."""
    base = continuous_server
    health = json.loads(urllib.request.urlopen(base + "/healthz").read())
    assert health["adapters"] == ["fin"]

    r = _post(base, "/generate",
              {"prompt": "analyze", "image_b64": _b64img(7), "max_tokens": 4,
               "adapter": "fin"})
    out = json.loads(r.read())
    assert out["continuous"] is True and out["num_tokens"] >= 1

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/generate",
              {"prompt": "analyze", "image_b64": _b64img(7), "max_tokens": 4,
               "adapter": "bogus"})
    assert e.value.code == 400
    assert "unknown adapter" in e.value.read().decode()


def test_metrics_endpoint(continuous_server):
    """GET /metrics: serving observability counters move under a scripted
    workload (VERDICT r3 #6)."""
    base = continuous_server
    m0 = json.loads(urllib.request.urlopen(base + "/metrics").read())
    assert m0["mode"] == "continuous"
    assert m0["slots_total"] == 2
    with _post(base, "/generate",
               {"prompt": "metrics probe", "image_b64": _b64img(42),
                "max_tokens": 6}) as r:
        out = json.loads(r.read())
    assert out["num_tokens"] >= 1
    m1 = json.loads(urllib.request.urlopen(base + "/metrics").read())
    # The request moved the counters: tokens delivered, chunks, completions,
    # HTTP 200s, and the chunk-throughput EMA appeared.
    assert m1["tokens_delivered"] >= m0.get("tokens_delivered", 0) + out["num_tokens"]
    assert m1["chunks_run"] > m0.get("chunks_run", 0)
    assert m1["requests_completed"] > m0.get("requests_completed", 0)
    assert m1["http_200"] > m0.get("http_200", 0)
    assert m1["chunk_tok_s_ema"] > 0
    assert m1["slots_occupied"] in (0, 1, 2)
    assert m1["in_flight"] == 0
    assert "uptime_s" in m1


def test_metrics_single_mode(server):
    """/metrics also serves the non-continuous engine (mode + HTTP counters)."""
    m = json.loads(urllib.request.urlopen(server + "/metrics").read())
    assert m["mode"] == "batched"
    assert "slots_total" not in m


def test_adapter_requires_continuous(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/generate",
              {"prompt": "x", "image_b64": _b64img(1), "max_tokens": 4,
               "adapter": "fin"})
    assert e.value.code == 400
    assert "continuous" in e.value.read().decode()


def test_admission_unit():
    """Admission rejects the (depth+1)-th in-flight request with 429."""
    sys.path.insert(0, REPO)
    from server import Admission, ServerOverloaded

    adm = Admission(depth=2)
    with adm.slot():
        with adm.slot():
            with pytest.raises(ServerOverloaded):
                with adm.slot():
                    pass
        # one slot freed -> admissible again
        with adm.slot():
            pass


@pytest.fixture(scope="module")
def overload_server():
    """Continuous server provisioned to overload: queue depth 1 and a 1 ms
    per-request deadline — every admitted request must be evicted (504) and
    every concurrent extra rejected (429 + Retry-After)."""
    port = 8963
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "server.py", "--demo", "--only_cpu",
         "--port", str(port), "--continuous", "--n_slots", "2",
         "--max_new_cap", "32", "--queue_depth", "1",
         "--request_timeout_s", "0.001"],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 240
    while time.time() < deadline:
        try:
            urllib.request.urlopen(base + "/healthz", timeout=5)
            break
        except (urllib.error.URLError, socket.timeout, ConnectionError):
            if proc.poll() is not None:
                raise RuntimeError(proc.stderr.read().decode()[-2000:])
            time.sleep(2)
    else:
        proc.kill()
        raise TimeoutError("overload server did not come up")
    yield base
    proc.kill()


def test_backpressure_and_deadline_under_load(overload_server):
    """N concurrent requests > capacity: overflow gets 429 (+Retry-After),
    admitted requests exceed the 1 ms deadline and get evicted with 504.
    Nothing hangs and nothing returns a silent 200."""
    base = overload_server
    codes, retry_after = [], []
    barrier = threading.Barrier(8)

    def worker(i):
        barrier.wait()
        try:
            with _post(base, "/generate",
                       {"prompt": f"load {i}", "image_b64": _b64img(i),
                        "max_tokens": 32}, timeout=60) as r:
                codes.append(r.status)
        except urllib.error.HTTPError as e:
            codes.append(e.code)
            if e.code == 429:
                retry_after.append(e.headers.get("Retry-After"))
            e.read()

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(codes) == 8, f"requests hung: only {len(codes)} returned"
    # Overflow must be rejected (429 + Retry-After) and every admitted
    # request must RESOLVE — normally evicted with 504, though any number
    # may legitimately finish 200 (EOS within the first chunk resolves a
    # request in ~ms, freeing the depth-1 slot for a late-starting thread,
    # which can then do the same). The hard invariants are: no hang, no
    # code outside {200, 429, 504}, overflow observed, Retry-After present.
    assert set(codes) <= {200, 429, 504}, codes
    assert 429 in codes, codes
    assert all(ra is not None for ra in retry_after)


def test_continuous_generate_join_error_is_500(continuous_server):
    base = continuous_server
    body = {"prompt": "y" * 4000, "image_b64": _b64img(4), "max_tokens": 4}
    try:
        with _post(base, "/generate", body, timeout=120) as r:
            assert False, f"expected 500, got {r.status}"
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "prompt" in e.read().decode()


def test_kv_window_auto_resolution():
    """--kv_window auto follows adaptive speculation (REPORT.md round 4:
    the window wins under the verify-heavy spec program, loses under plain).
    """
    import argparse

    import server as srv

    def args(**kw):
        d = dict(kv_window="auto", spec_k=4, spec_adaptive="on")
        d.update(kw)
        return argparse.Namespace(**d)

    assert srv._kv_window_enabled(args()) is True           # default config
    assert srv._kv_window_enabled(args(spec_k=0)) is False  # spec disabled
    assert srv._kv_window_enabled(args(spec_adaptive="off")) is False
    assert srv._kv_window_enabled(args(kv_window="off")) is False
    assert srv._kv_window_enabled(args(kv_window="on", spec_k=0)) is True
