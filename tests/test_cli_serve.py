"""CLI `serve` command end to end: real subprocess, real socket."""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

from visual_rag_tpu.index import CollectionSchema, IndexBuilder
from visual_rag_tpu.ops import global_mean_pooling, tile_level_mean_pooling


@pytest.fixture(scope="module")
def collection_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    b = IndexBuilder(CollectionSchema.standard(storage_dtype="float32"))
    for i in range(12):
        t = rng.standard_normal((2 * 64, 128)).astype(np.float32)
        mp = np.asarray(tile_level_mean_pooling(t, 2))
        b.add(f"p{i}", {"initial": t, "mean_pooling": mp,
                        "experimental_pooling": mp,
                        "global_pooling": np.asarray(global_mean_pooling(mp))},
              {})
    root = tmp_path_factory.mktemp("cli_serve")
    b.save(root / "demo")
    return str(root)


def test_serve_subprocess(collection_dir):
    env = dict(os.environ, VISUALRAG_PLATFORM="cpu")
    env.pop("PYTHONPATH", None)
    port = 8870 + os.getpid() % 100
    proc = subprocess.Popen(
        [sys.executable, "-m", "visual_rag_tpu.cli.main", "serve",
         "--index-dir", collection_dir, "--collection", "demo",
         "--no-embedder", "--port", str(port)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 90
        up = False
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=2) as r:
                    up = r.status == 200
                    break
            except OSError:
                if proc.poll() is not None:
                    out = proc.stdout.read().decode()
                    pytest.fail(f"serve exited early:\n{out[-2000:]}")
                time.sleep(1)
        assert up, "server never came up"
        q = np.random.default_rng(1).standard_normal((8, 128)).astype(np.float32)
        req = urllib.request.Request(
            f"{base}/search", data=json.dumps(
                {"embedding": q.tolist(), "mode": "two_stage", "top_k": 3,
                 "prefetch_k": 6}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        assert r.status == 200 and len(body["results"]) == 3
        assert all(x["id"].startswith("p") for x in body["results"])
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
