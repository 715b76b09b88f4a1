"""HTTP serving front-end (cli/serve.py): bundle-backed /encode route,
health/error protocol.  The /classify route is tested in test_toolkit.py
next to the classifier fixture it serves."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from protoclip_tpu.cli.serve import build_server
from protoclip_tpu.io.export import save_serving_bundle
from protoclip_tpu.models.clip import CLIPConfig, init_clip_params

TINY_VIT = CLIPConfig(
    "tiny-vit", embed_dim=32, image_resolution=32, vision_layers=2,
    vision_width=64, vision_patch_size=16, context_length=16, vocab_size=128,
    transformer_width=64, transformer_layers=2,
)


def _b64_jpeg(arr: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")  # PNG: lossless, deterministic
    return base64.b64encode(buf.getvalue()).decode()


def _post(port: int, path: str, obj: dict):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    bundle = str(tmp_path_factory.mktemp("srv") / "bundle")
    params = init_clip_params(jax.random.PRNGKey(0), TINY_VIT)
    save_serving_bundle(bundle, TINY_VIT, params, batch_size=4)
    srv = build_server(port=0, bundle=bundle, quiet=True)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, bundle
    srv.shutdown()
    srv.server_close()
    thread.join(timeout=5)


def test_healthz_and_routes(server):
    srv, _ = server
    port = srv.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"
    assert health["mode"] == "encode"
    assert health["backbone"] == "tiny-vit"

    status, body = _post(port, "/nope", {})
    assert status == 404 and "/encode" in body["routes"]


def test_encode_route_matches_direct_bundle_call(server):
    from protoclip_tpu.data.transforms import clip_preprocess
    from protoclip_tpu.io.export import load_serving_bundle

    srv, bundle = server
    port = srv.server_address[1]
    rng = np.random.default_rng(0)
    # 6 images > batch_size=4: exercises the chunk loop; odd sizes
    # exercise the preprocess resize
    arrs = [
        rng.integers(0, 256, (40 + i, 37 + i, 3)).astype(np.uint8)
        for i in range(6)
    ]
    status, body = _post(port, "/encode", {"images": [_b64_jpeg(a) for a in arrs]})
    assert status == 200
    feats = np.asarray(body["features"], np.float32)
    assert feats.shape == (6, 32)

    # value-check EVERY row, crucially the partial second chunk (4-5):
    # the zero-padded tail is the path most likely to mis-slice
    encode = load_serving_bundle(bundle)
    for start in (0, 4):
        block = np.zeros((4, 32, 32, 3), np.uint8)
        chunk = arrs[start : start + 4]
        for i, a in enumerate(chunk):
            block[i] = clip_preprocess(Image.fromarray(a), 32)
        want = encode(block)[: len(chunk)]
        np.testing.assert_allclose(feats[start : start + 4], want, atol=1e-6)


def test_encode_route_rejects_bad_payloads(server):
    srv, _ = server
    port = srv.server_address[1]
    status, body = _post(port, "/encode", {})
    assert status == 400 and "images" in body["error"]
    status, body = _post(port, "/encode", {"images": ["!!not-b64!!"]})
    assert status == 400 and "images[0]" in body["error"]


def test_content_length_protocol(server):
    """Malformed/hostile Content-Length must produce an error response, not
    a blocking read that wedges the single-threaded server."""
    import http.client

    srv, _ = server
    port = srv.server_address[1]

    def raw_post(headers: dict, body: bytes = b"") -> int:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        try:
            conn.putrequest("POST", "/encode", skip_accept_encoding=True)
            for k, v in headers.items():
                conn.putheader(k, v)
            conn.endheaders()
            if body:
                conn.send(body)
            return conn.getresponse().status
        finally:
            conn.close()

    assert raw_post({}) == 411                          # missing length
    assert raw_post({"Content-Length": "abc"}) == 411   # unparseable
    assert raw_post({"Content-Length": "-1"}) == 400    # negative
    assert raw_post({"Content-Length": str(300 << 20)}) == 413  # oversized
    # server still alive and serving afterwards
    import urllib.request

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
        assert resp.status == 200


def test_internal_error_returns_500_and_server_survives(server):
    """The broad except in do_POST must surface non-ValueError failures as
    500 JSON and keep the single-threaded server alive (serve.py docstring
    protocol)."""
    srv, _ = server

    def boom(payload):
        raise RuntimeError("kaboom")

    srv.RequestHandlerClass.routes["/boom"] = boom
    try:
        port = srv.server_address[1]
        status, body = _post(port, "/boom", {})
        assert status == 500 and "RuntimeError" in body["error"]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
            assert resp.status == 200  # still alive
    finally:
        del srv.RequestHandlerClass.routes["/boom"]


def test_short_body_times_out_instead_of_wedging(server):
    """Content-Length larger than the bytes actually sent: the class-level
    socket timeout must unblock rfile.read so one stalled client cannot
    wedge the server forever."""
    import socket

    srv, _ = server
    port = srv.server_address[1]
    handler = srv.RequestHandlerClass
    old_timeout = handler.timeout
    handler.timeout = 1  # don't wait 120 s in CI
    try:
        sock = socket.create_connection(("127.0.0.1", port), timeout=10)
        sock.sendall(
            b"POST /encode HTTP/1.1\r\nHost: x\r\nContent-Length: 1000\r\n\r\n"
            b"short"  # 5 of the promised 1000 bytes, connection held open
        )
        # whether the server answers 500 on this socket or just drops it is
        # secondary; the contract is that it UNBLOCKS and serves others
        import time

        time.sleep(2.5)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            assert resp.status == 200
        sock.close()
    finally:
        handler.timeout = old_timeout


def test_bucketed_bundle_serving_matches_full_batch(tmp_path):
    """A bundle exported with batch_sizes serves underfull requests off a
    smaller compiled bucket (trim_underfull path) with results identical
    to the full-batch path, and /healthz reports the buckets."""
    import urllib.request

    from protoclip_tpu.io.export import load_serving_bundle

    bundle = str(tmp_path / "bundle")
    params = init_clip_params(jax.random.PRNGKey(3), TINY_VIT)
    save_serving_bundle(bundle, TINY_VIT, params, batch_size=8, batch_sizes=(2,))
    srv = build_server(port=0, bundle=bundle, quiet=True, coalesce_ms=0.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
            health = json.loads(resp.read())
        assert health["batch_sizes"] == [2, 8]
        route = srv.RequestHandlerClass.routes["/encode"]
        assert route.batcher.trim_underfull

        rng = np.random.default_rng(7)
        arrs = [rng.integers(0, 256, (40, 37, 3)).astype(np.uint8) for _ in range(2)]
        status, body = _post(port, "/encode", {"images": [_b64_jpeg(a) for a in arrs]})
        assert status == 200
        got = np.asarray(body["features"], np.float32)

        # reference: the same rows through the max-bucket direct call
        from protoclip_tpu.data.transforms import clip_preprocess
        from PIL import Image as _Image
        import base64 as _b64
        import io as _io

        encode = load_serving_bundle(bundle)
        block = np.zeros((8, 32, 32, 3), np.uint8)
        for i, a in enumerate(arrs):
            im = _Image.open(_io.BytesIO(_b64.b64decode(_b64_jpeg(a))))
            block[i] = clip_preprocess(im.convert("RGB"), 32)
        want = encode(block)[:2]
        np.testing.assert_array_equal(got, want.astype(np.float32))
    finally:
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=5)


def test_dual_mode_healthz_reports_both_routes(tmp_path):
    """bundle + classifier together: /healthz must expose BOTH routes'
    info, not silently drop the encode manifest.  (Only the construction /
    healthz surface is under test — the fake's classify path is never
    dispatched.)"""
    from protoclip_tpu.cli.serve import build_server

    class FakeClassifier:  # just enough surface for the route builder
        class cfg:
            backbone = "tiny"
            top_k = 2

        class clip_cfg:
            image_resolution = 8

        class_id_mapping = {0: "a", 1: "b"}
        max_batch = 4

        def infer_canvases(self, canvases):
            raise AssertionError("not dispatched in this construction-only test")

    bundle = str(tmp_path / "bundle")
    params = init_clip_params(jax.random.PRNGKey(0), TINY_VIT)
    save_serving_bundle(bundle, TINY_VIT, params, batch_size=2)
    srv = build_server(
        port=0, bundle=bundle, classifier=FakeClassifier(),
        quiet=True, warmup=False,
    )
    try:
        info = srv.RequestHandlerClass.info
        assert info["mode"] == "classify+encode"
        assert info["encode"]["backbone"] == "tiny-vit"
        assert info["encode"]["batch_size"] == 2
        assert info["classify"]["num_classes"] == 2
        assert set(srv.RequestHandlerClass.routes) == {"/encode", "/classify"}
    finally:
        srv.server_close()


def test_concurrent_encode_requests_coalesce_and_stay_bitidentical(server):
    """N concurrent 1-image requests share device dispatches (the
    micro-batcher's reason to exist) AND return exactly the features the
    same images get when posted serially — per-image independence makes
    coalescing bit-identical, whatever the batch neighbors are."""
    _, bundle = server
    # dedicated server: a wide fill window so the concurrent burst below
    # coalesces deterministically even under slow thread scheduling
    srv = build_server(port=0, bundle=bundle, quiet=True, coalesce_ms=250.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        port = srv.server_address[1]
        rng = np.random.default_rng(7)
        arrs = [
            rng.integers(0, 256, (36 + i, 41 - i, 3)).astype(np.uint8)
            for i in range(4)
        ]
        payloads = [{"images": [_b64_jpeg(a)]} for a in arrs]

        serial = []
        for p in payloads:
            status, body = _post(port, "/encode", p)
            assert status == 200
            serial.append(np.asarray(body["features"], np.float32))

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/statz") as resp:
            before = json.loads(resp.read())["/encode"]
        assert before["dispatches"] == len(payloads)  # serial: one each

        barrier = threading.Barrier(len(payloads))
        results = [None] * len(payloads)

        def worker(i):
            barrier.wait()
            status, body = _post(port, "/encode", payloads[i])
            results[i] = (status, body)

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(payloads))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)

        for i, (status, body) in enumerate(results):
            assert status == 200
            got = np.asarray(body["features"], np.float32)
            np.testing.assert_array_equal(got, serial[i])

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/statz") as resp:
            after = json.loads(resp.read())["/encode"]
        assert after["images"] - before["images"] == len(payloads)
        # the 4 concurrent single-image requests must not each have paid
        # a dispatch (batch_size=4; any coalescing at all -> <4)
        assert after["dispatches"] - before["dispatches"] < len(payloads)
    finally:
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=5)


def test_serve_client_encode_and_errors(server):
    """ServeClient (client.py) speaks the protocol: healthz/statz,
    array/bytes/path image forms all encode to the same features as a raw
    protocol post, and server errors surface as ServeError."""
    from protoclip_tpu.client import ServeClient, ServeError

    srv, _ = server
    client = ServeClient(f"http://127.0.0.1:{srv.server_address[1]}")
    assert client.healthz()["status"] == "ok"

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (40, 30, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")

    feats = client.encode([arr, buf.getvalue()])  # array + raw bytes
    _, raw = _post(srv.server_address[1], "/encode",
                   {"images": [_b64_jpeg(arr)]})
    want = np.asarray(raw["features"], np.float32)
    np.testing.assert_array_equal(feats[0], want[0])
    np.testing.assert_array_equal(feats[1], want[0])  # same pixels

    assert client.statz()["/encode"]["dispatches"] > 0

    with pytest.raises(ServeError, match="not decodable"):
        client.encode([b"junk-bytes"])
    with pytest.raises(ServeError) as exc_info:
        client._post("/nope", [arr])
    assert exc_info.value.status == 404
    with pytest.raises(ValueError, match="uint8"):
        client.encode([arr.astype(np.float32)])

    # jax-free import contract: client machines must not need jax.  (A
    # runtime sys.modules probe is impossible here — this sandbox's
    # sitecustomize preloads jax into every interpreter — so check the
    # module's import graph statically: stdlib + numpy + lazy PIL only.)
    import ast

    import protoclip_tpu.client as client_mod

    with open(client_mod.__file__) as fh:
        tree = ast.parse(fh.read())
    roots = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            roots.update(alias.name.split(".")[0] for alias in node.names)
        elif isinstance(node, ast.ImportFrom) and node.module:
            roots.add(node.module.split(".")[0])
    assert "jax" not in roots and "protoclip_tpu" not in roots, roots


def test_fast_decode_mode_serves_jpegs(server):
    """--fast-decode (libjpeg DCT-scaled draft) must decode JPEG payloads
    and stay a no-op for PNGs; /healthz reports the mode."""
    _, bundle = server
    srv = build_server(port=0, bundle=bundle, quiet=True, fast_decode=True)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
            assert json.loads(resp.read())["fast_decode"] is True

        rng = np.random.default_rng(11)
        arr = rng.integers(0, 256, (300, 400, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)
        jpeg_b64 = base64.b64encode(buf.getvalue()).decode()
        png_b64 = _b64_jpeg(arr)  # PNG: draft is a documented no-op
        status, body = _post(port, "/encode", {"images": [jpeg_b64, png_b64]})
        assert status == 200
        feats = np.asarray(body["features"], np.float32)
        assert feats.shape[0] == 2 and np.isfinite(feats).all()
        # the DCT-scaled decode is approximate, not garbage: both decodes
        # of the same source image must produce nearby features
        cos = np.dot(feats[0], feats[1]) / (
            np.linalg.norm(feats[0]) * np.linalg.norm(feats[1])
        )
        assert cos > 0.9
    finally:
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=5)


def test_server_close_waits_for_inflight_handlers(server):
    """A request caught mid-handler by a graceful shutdown must still be
    answered 200 (regression: handler threads are daemonic, so socketserver's
    server_close() does not join them — the batcher used to be closed while
    a handler sat between accept and batcher.submit(), failing it with 500)."""
    import time

    _, bundle = server
    srv = build_server(port=0, bundle=bundle, quiet=True, coalesce_ms=0.0)
    handler = srv.RequestHandlerClass
    entered, release = threading.Event(), threading.Event()
    real_route = handler.routes["/encode"]

    def gated(payload):
        entered.set()
        assert release.wait(timeout=30)
        return real_route(payload)

    gated.batcher = getattr(real_route, "batcher", None)
    handler.routes = dict(handler.routes, **{"/encode": gated})

    serve_thread = threading.Thread(target=srv.serve_forever, daemon=True)
    serve_thread.start()
    port = srv.server_address[1]
    img = _b64_jpeg(np.zeros((32, 32, 3), np.uint8))
    result = {}

    def client():
        result["resp"] = _post(port, "/encode", {"images": [img]})

    client_thread = threading.Thread(target=client, daemon=True)
    client_thread.start()
    assert entered.wait(timeout=30)  # request is mid-handler

    def close():
        srv.shutdown()
        srv.server_close()

    closer = threading.Thread(target=close, daemon=True)
    closer.start()
    time.sleep(0.2)  # let server_close reach its in-flight wait
    release.set()
    closer.join(timeout=30)
    client_thread.join(timeout=30)
    serve_thread.join(timeout=30)
    assert not closer.is_alive()
    status, body = result["resp"]
    assert status == 200 and "features" in body


def test_server_close_waits_for_accepted_but_unparsed_request(server):
    """A connection accepted BEFORE shutdown whose request bytes arrive
    slowly must still be answered 200: in-flight accounting starts at
    accept time in process_request, not in do_POST (regression: counting
    inside do_POST left the thread-spawn/header-parse window invisible to
    server_close's wait, so the batcher closed under the late request)."""
    import socket
    import time

    _, bundle = server
    srv = build_server(port=0, bundle=bundle, quiet=True, coalesce_ms=0.0)
    serve_thread = threading.Thread(target=srv.serve_forever, daemon=True)
    serve_thread.start()
    port = srv.server_address[1]
    img = _b64_jpeg(np.zeros((32, 32, 3), np.uint8))
    body = json.dumps({"images": [img]}).encode()
    head = (
        f"POST /encode HTTP/1.1\r\nHost: x\r\nContent-Type: application/json"
        f"\r\nContent-Length: {len(body)}\r\n\r\n"
    ).encode()

    sock = socket.create_connection(("127.0.0.1", port), timeout=30)
    try:
        sock.sendall(head[:7])  # accepted, but the request line is unparsed
        # wait until the accept has actually been tracked (the connection is
        # established by the kernel before serve_forever's accept() runs)
        deadline = time.monotonic() + 30
        while srv._inflight < 1 and time.monotonic() < deadline:
            time.sleep(0.005)
        assert srv._inflight >= 1

        closer = threading.Thread(
            target=lambda: (srv.shutdown(), srv.server_close()), daemon=True
        )
        closer.start()
        time.sleep(0.2)  # let server_close reach its in-flight wait
        sock.sendall(head[7:] + body)  # finish the request mid-shutdown
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(65536)
            if not chunk:
                break
            resp += chunk
        status = int(resp.split(b" ", 2)[1])
        closer.join(timeout=30)
        serve_thread.join(timeout=30)
        assert status == 200
    finally:
        sock.close()


def test_cli_sigterm_graceful_shutdown(server):
    """The CLI process must exit 0 on SIGTERM (supervisor/container stop):
    serve_forever unwinds, server_close reaps the batcher + pools."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time

    _, bundle = server
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"})
    proc = subprocess.Popen(
        [sys.executable, "-m", "protoclip_tpu.cli.serve",
         "--bundle", bundle, "--port", str(port)],
        env=env, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=2
                ) as resp:
                    assert json.loads(resp.read())["status"] == "ok"
                    break
            except (urllib.error.URLError, ConnectionError):
                time.sleep(0.3)
        else:
            pytest.fail("server never became healthy")
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)


def test_connection_burst_is_not_reset(server):
    """A burst of concurrent clients must all be served, none reset.
    Regression: socketserver's default listen backlog of 5 made the kernel
    reset connections under exactly the concurrent load micro-batching
    exists for (measured on hardware via scripts/bench_serve_http.py)."""
    srv, _ = server
    assert type(srv).request_queue_size >= 64
    port = srv.server_address[1]
    n = 48
    payload = {"images": [_b64_jpeg(np.zeros((24, 24, 3), np.uint8))]}
    statuses = [None] * n
    barrier = threading.Barrier(n)

    def worker(i):
        barrier.wait()  # all n connect at once
        statuses[i], _ = _post(port, "/encode", payload)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive()
    assert statuses == [200] * n


def test_mesh_encode_route_matches_single_device():
    """The live data-parallel /encode (--mesh) must return the SAME features
    as the canonical single-device encode (io/export.make_encode_fn) — the
    encode is row-local, so sharding the batch over the 8-device mesh is a
    pure layout change.  Also pins the healthz surface of the mesh mode."""
    from protoclip_tpu.data.transforms import clip_preprocess
    from protoclip_tpu.io.export import make_encode_fn

    params = init_clip_params(jax.random.PRNGKey(3), TINY_VIT)
    srv = build_server(
        port=0, clip=(TINY_VIT, params), mesh_devices=8, per_device_batch=1,
        quiet=True, coalesce_ms=0.0,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    port = srv.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
            health = json.loads(resp.read())
        assert health["mode"] == "encode"
        assert health["mesh_devices"] == 8
        assert health["per_device_batch"] == 1
        assert health["batch_size"] == 8
        assert health["backbone"] == "tiny-vit"
        # int8 reports what the route actually serves: on this CPU backend
        # the Pallas gate is closed, so even PROTOCLIP_INT8=1 must report
        # False (the env var alone never quantizes — models/clip.py:488-492)
        assert health["int8"] is False

        rng = np.random.default_rng(7)
        # 11 images > global batch 8: exercises the over-batch split; odd
        # sizes exercise the preprocess path
        arrs = [
            rng.integers(0, 256, (40 + i, 37 + i, 3)).astype(np.uint8)
            for i in range(11)
        ]
        status, body = _post(port, "/encode", {"images": [_b64_jpeg(a) for a in arrs]})
        assert status == 200
        feats = np.asarray(body["features"], np.float32)
        assert feats.shape == (11, 32)

        block = np.zeros((len(arrs), 32, 32, 3), np.uint8)
        for i, a in enumerate(arrs):
            block[i] = clip_preprocess(Image.fromarray(a), 32)
        want = np.asarray(jax.jit(make_encode_fn(TINY_VIT))(params, block))
        np.testing.assert_allclose(feats, want, atol=1e-5)
    finally:
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=5)


def test_mesh_route_int8_reporting_and_interpret_serving(monkeypatch):
    """/healthz int8 reflects the TRACED serving dtype (round-3 advisor):
    pre-quantized weights with gates off report int8=False (plus the
    prequantized marker); gates on with interpret-forced kernels actually
    serve the W8A8 path on the virtual CPU mesh."""
    from protoclip_tpu.cli.serve import make_mesh_encode_route
    from protoclip_tpu.models.clip import quantize_for_serving

    params = init_clip_params(jax.random.PRNGKey(4), TINY_VIT)

    # (a) preloaded QUANTIZED weights, gates off -> the traced path is bf16:
    # int8 must report False even though blocks_q is present
    monkeypatch.delenv("PROTOCLIP_INT8", raising=False)
    monkeypatch.setenv("PROTOCLIP_PALLAS", "0")
    qparams = quantize_for_serving(params)
    route, info = make_mesh_encode_route(
        clip=(TINY_VIT, qparams), mesh_devices=8, per_device_batch=1,
        warmup=False, coalesce_ms=0.0,
    )
    try:
        assert info["int8"] is False
        assert info["int8_weights_prequantized"] is True
    finally:
        route.batcher.close()
        route.pool.shutdown(wait=False)

    # (b) gates on + interpret-forced kernels: the route serves int8 for
    # real on the CPU mesh (in-trace quantization — no blocks_q needed)
    monkeypatch.setenv("PROTOCLIP_PALLAS", "1")
    monkeypatch.setenv("PROTOCLIP_INT8", "1")
    monkeypatch.setenv("PROTOCLIP_PALLAS_INTERPRET", "1")
    route, info = make_mesh_encode_route(
        clip=(TINY_VIT, params), mesh_devices=8, per_device_batch=1,
        warmup=True, coalesce_ms=0.0,
    )
    try:
        assert info["int8"] is True
        assert info["int8_weights_prequantized"] is False
        out = route({"images": [_b64_jpeg(np.zeros((32, 32, 3), np.uint8))]})
        feats = np.asarray(out["features"], np.float32)
        assert feats.shape == (1, 32) and np.isfinite(feats).all()
        np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)
    finally:
        route.batcher.close()
        route.pool.shutdown(wait=False)


def test_mesh_mode_and_bundle_are_mutually_exclusive(tmp_path):
    params = init_clip_params(jax.random.PRNGKey(0), TINY_VIT)
    bundle = str(tmp_path / "bundle")
    save_serving_bundle(bundle, TINY_VIT, params, batch_size=2)
    with pytest.raises(ValueError, match="pick one"):
        build_server(port=0, bundle=bundle, clip=(TINY_VIT, params))


def test_metrics_prometheus_exposition(server):
    """GET /metrics: Prometheus text format carrying the HTTP response
    counters and the micro-batcher stats, consistent with /statz."""
    import re

    srv, _ = server
    port = srv.server_address[1]

    # generate at least one 200 on /encode and one bucketed 404
    rng = np.random.default_rng(21)
    arr = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    status, _ = _post(port, "/encode", {"images": [_b64_jpeg(arr)]})
    assert status == 200
    status, _ = _post(port, "/nope", {})
    assert status == 404

    req = urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics")
    assert req.headers["Content-Type"].startswith("text/plain")
    text = req.read().decode()

    # every non-comment line is a well-formed sample
    sample = re.compile(r'^[a-z_]+(\{[a-z]+="[^"]*"(,[a-z]+="[^"]*")*\})? [-0-9.e+]+$')
    for line in text.strip().split("\n"):
        if not line.startswith("#"):
            assert sample.match(line), line

    def value(name, **labels):
        from tests.conftest import prometheus_value

        return prometheus_value(text, name, **labels)

    assert value("protoclip_http_responses_total", route="/encode", code=200) >= 1
    # unknown paths are bucketed to bound label cardinality
    assert value("protoclip_http_responses_total", route="other", code=404) >= 1

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/statz") as resp:
        statz = json.loads(resp.read())["/encode"]
    assert value("protoclip_dispatches_total", route="/encode") == statz["dispatches"]
    assert value("protoclip_images_total", route="/encode") == statz["images"]
    assert value("protoclip_batch_size", route="/encode") == statz["batch_size"]
    assert value("protoclip_dispatch_latency_ms", route="/encode", quantile="0.5") > 0

    from protoclip_tpu.client import ServeClient

    client = ServeClient(f"http://127.0.0.1:{port}")
    assert "protoclip_dispatches_total" in client.metrics()


def test_metrics_mesh_mode(mesh_server):
    """/metrics in --mesh serving mode: the mesh /encode route's batcher
    stats and HTTP counters appear with the same exposition as bundle mode
    (observability is tested on EVERY serving mode, not just one)."""
    import re

    srv = mesh_server
    port = srv.server_address[1]
    rng = np.random.default_rng(22)
    arr = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    status, body = _post(port, "/encode", {"images": [_b64_jpeg(arr)] * 3})
    assert status == 200 and len(body["features"]) == 3

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as resp:
        text = resp.read().decode()

    def value(name, **labels):
        from tests.conftest import prometheus_value

        return prometheus_value(text, name, **labels)

    assert value("protoclip_http_responses_total", route="/encode", code=200) >= 1
    assert value("protoclip_dispatches_total", route="/encode") >= 1
    assert value("protoclip_images_total", route="/encode") >= 3
    assert value("protoclip_dispatch_latency_ms", route="/encode", quantile="0.5") > 0
    # the mesh route advertises its geometry on /healthz
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
        health = json.loads(resp.read())
    assert health["mesh_devices"] == jax.device_count()


@pytest.fixture(scope="module")
def mesh_server():
    """A --mesh-mode server over the virtual CPU mesh (all 8 devices)."""
    params = init_clip_params(jax.random.PRNGKey(0), TINY_VIT)
    srv = build_server(
        port=0, clip=(TINY_VIT, params), per_device_batch=1, quiet=True,
        coalesce_ms=0.0,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()
    srv.server_close()
    thread.join(timeout=5)


def test_healthz_degrades_on_dispatch_failures(server):
    """Failure detection: consecutive failed device dispatches turn
    /healthz into a 503 "degraded" (so load balancers pull the host), with
    the failure streak and last error visible in /statz and /metrics; one
    successful dispatch restores 200 "ok"."""
    srv, _ = server
    port = srv.server_address[1]
    route = _Handler_route(srv)
    batcher = route.batcher
    real_run = batcher._run_batch

    rng = np.random.default_rng(33)
    arr = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    payload = {"images": [_b64_jpeg(arr)]}

    def boom(block):
        raise RuntimeError("device vanished")

    batcher._run_batch = boom
    try:
        for _ in range(3):
            status, body = _post(port, "/encode", payload)
            assert status == 500 and "device vanished" in body["error"]

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as resp:
            text = resp.read().decode()
        assert 'protoclip_dispatch_failures_total{route="/encode"} 3' in text

        # the degraded healthz fires one (still-failing) recovery probe
        req = urllib.request.Request(f"http://127.0.0.1:{port}/healthz")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as err:
            assert err.code == 503
            health = json.loads(err.read())
        assert health["status"] == "degraded"
        assert health["routes"]["/encode"]["consecutive_failures"] >= 3
        assert "device vanished" in health["routes"]["/encode"]["last_error"]
    finally:
        batcher._run_batch = real_run

    # recovery: one good dispatch resets the streak
    status, _ = _post(port, "/encode", payload)
    assert status == 200
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
        assert json.loads(resp.read())["status"] == "ok"
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/statz") as resp:
        stats = json.loads(resp.read())["/encode"]
    # 3 failed POST dispatches + the failed healthz probe
    assert stats["failures"] == 4 and stats["consecutive_failures"] == 0


def test_degraded_healthz_self_recovers_without_traffic(server, monkeypatch):
    """A pulled replica receives only health checks: once the device works
    again, the degraded /healthz's own rate-limited probe dispatch must
    restore 200 — no POST traffic required (SCALING.md fleet monitoring)."""
    srv, _ = server
    port = srv.server_address[1]
    batcher = _Handler_route(srv).batcher
    real_run = batcher._run_batch
    monkeypatch.setattr(srv.RequestHandlerClass, "probe_interval_s", 0.0)

    rng = np.random.default_rng(34)
    arr = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    payload = {"images": [_b64_jpeg(arr)]}

    def boom(block):
        raise RuntimeError("tunnel down")

    batcher._run_batch = boom
    try:
        for _ in range(3):
            status, _ = _post(port, "/encode", payload)
            assert status == 500
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as err:
            assert err.code == 503
    finally:
        batcher._run_batch = real_run

    # device is back; the next health check alone must recover the replica
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
        assert json.loads(resp.read())["status"] == "ok"


def test_degraded_healthz_is_bounded_under_hung_probe(server, monkeypatch):
    """A HUNG (non-erroring) device must not stall health checks: the
    recovery probe runs in a background thread joined for at most
    ``probe_join_s``, and while it is in flight later /healthz requests
    503 immediately instead of each blocking on a fresh probe."""
    import time

    srv, _ = server
    port = srv.server_address[1]
    batcher = _Handler_route(srv).batcher
    real_run = batcher._run_batch
    monkeypatch.setattr(srv.RequestHandlerClass, "probe_interval_s", 0.0)
    monkeypatch.setattr(srv.RequestHandlerClass, "probe_join_s", 0.3)

    rng = np.random.default_rng(35)
    arr = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    payload = {"images": [_b64_jpeg(arr)]}

    def boom(block):
        raise RuntimeError("device gone")

    batcher._run_batch = boom
    try:
        for _ in range(3):
            status, _ = _post(port, "/encode", payload)
            assert status == 500
        hung = threading.Event()
        released = threading.Event()

        def hang(block):
            hung.set()
            released.wait(30.0)
            return real_run(block)

        batcher._run_batch = hang
        # first degraded check spawns the probe and waits <= probe_join_s
        t0 = time.monotonic()
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as err:
            assert err.code == 503
        first = time.monotonic() - t0
        assert hung.wait(5.0), "probe never reached the device"
        assert first < 5.0  # bounded, not the 30s hang
        # probe still in flight: the next check must 503 at once
        t0 = time.monotonic()
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as err:
            assert err.code == 503
        assert time.monotonic() - t0 < 1.0
    finally:
        released.set()
        time.sleep(0.4)  # let the in-flight probe drain through real_run
        batcher._run_batch = real_run

    # device is back; a later health check recovers via a fresh probe
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
                assert json.loads(resp.read())["status"] == "ok"
                break
        except urllib.error.HTTPError:
            time.sleep(0.2)
    else:
        raise AssertionError("replica never recovered")


def _Handler_route(srv):
    """The /encode route object bound to this server's handler class."""
    return srv.RequestHandlerClass.routes["/encode"]
