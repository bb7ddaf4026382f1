"""End-to-end artifact pipeline against a live (loopback) HTTP endpoint.

The reference's release channel is a public S3 bucket fetched over HTTPS
(download_artifacts.py:44-217). Egress is unavailable in CI, so these tests
stand up a real HTTP server on 127.0.0.1 that speaks the same protocol the
downloader relies on (HEAD with content-md5 ETags, then GET) and drive the
FULL chain: registry -> HEAD/ETag skip logic -> download -> Lightning `.ckpt`
payload -> load_reference_checkpoint -> strict param import.
"""

import hashlib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest
import torch

from scldm_tpu.utils.artifacts import Artifact, download_artifacts


class _S3LikeHandler(BaseHTTPRequestHandler):
    """Serves a directory with S3-single-part semantics: ETag = md5(body)."""

    root: Path = None  # set per-server
    log: list = None  # (method, path) tuples, for skip-logic assertions

    def _serve(self, with_body: bool):
        type(self).log.append((self.command, self.path))
        p = (self.root / self.path.lstrip("/")).resolve()
        if not (p.is_file() and str(p).startswith(str(self.root.resolve()))):
            self.send_error(404)
            return
        data = p.read_bytes()
        self.send_response(200)
        self.send_header("ETag", f'"{hashlib.md5(data).hexdigest()}"')
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        if with_body:
            self.wfile.write(data)

    def do_GET(self):
        self._serve(True)

    def do_HEAD(self):
        self._serve(False)

    def log_message(self, *args):  # keep pytest output clean
        pass


@pytest.fixture()
def bucket(tmp_path, monkeypatch):
    """A loopback 'bucket': (base_url, served_dir, request_log)."""
    # urllib honors proxy env vars; force direct loopback connections
    for var in ("http_proxy", "https_proxy", "HTTP_PROXY", "HTTPS_PROXY"):
        monkeypatch.delenv(var, raising=False)
    served = tmp_path / "served"
    served.mkdir()
    log = []
    handler = type("Handler", (_S3LikeHandler,), {"root": served, "log": log})
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_port}", served, log
    finally:
        server.shutdown()
        thread.join(timeout=5)


def _make_lightning_ckpt(path: Path, state_dict, prefix="vae_model."):
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(
        {
            "epoch": 3,
            "global_step": 12000,
            "pytorch-lightning_version": "2.4.0",
            "state_dict": {f"{prefix}{k}": v for k, v in state_dict.items()},
            "optimizer_states": [{"state": {}, "param_groups": [{"lr": 1e-3}]}],
        },
        path,
    )


class TestDownloadProtocol:
    def test_download_skip_and_redownload(self, bucket, tmp_path):
        base_url, served, log = bucket
        key = "resubmission/dentate_gyrus_log_size_factor_mu.pkl"
        (served / key).parent.mkdir(parents=True)
        payload = b"x" * 4096
        (served / key).write_bytes(payload)
        arts = [Artifact(key, "resubmission")]
        out = tmp_path / "artifacts"

        got = download_artifacts(out, artifacts=arts, base_url=base_url)
        assert got == [out / key]
        assert (out / key).read_bytes() == payload
        assert ("GET", f"/{key}") in log

        # second run: ETag matches the local md5 -> HEAD only, no GET
        log.clear()
        got = download_artifacts(out, artifacts=arts, base_url=base_url)
        assert got == [out / key]
        assert log == [("HEAD", f"/{key}")]

        # corrupted local copy -> md5 mismatch -> re-downloaded
        (out / key).write_bytes(b"corrupt")
        log.clear()
        download_artifacts(out, artifacts=arts, base_url=base_url)
        assert (out / key).read_bytes() == payload
        assert ("GET", f"/{key}") in log

    def test_group_and_dataset_filters_hit_only_selected_keys(self, bucket, tmp_path):
        base_url, served, log = bucket
        keys = {
            "datasets/dentate_gyrus_train.h5ad": "datasets",
            "datasets/hlca_train.h5ad": "datasets",
            "resubmission/dentate_gyrus_negative_binomial.ckpt": "resubmission",
        }
        for k in keys:
            (served / k).parent.mkdir(parents=True, exist_ok=True)
            (served / k).write_bytes(k.encode())
        arts = [Artifact(k, g) for k, g in keys.items()]

        download_artifacts(
            tmp_path / "out", groups=["datasets"], datasets=["dentate_gyrus"],
            artifacts=arts, base_url=base_url,
        )
        touched = {p for _, p in log}
        assert touched == {"/datasets/dentate_gyrus_train.h5ad"}

    def test_missing_key_is_reported_not_fatal(self, bucket, tmp_path):
        base_url, served, log = bucket
        present = "datasets/parse1m_train.h5ad"
        (served / present).parent.mkdir(parents=True)
        (served / present).write_bytes(b"ok")
        arts = [Artifact("datasets/absent.h5ad", "datasets"), Artifact(present, "datasets")]
        got = download_artifacts(tmp_path / "out", artifacts=arts, base_url=base_url)
        # the 404 is skipped, the rest of the manifest still lands
        assert got == [tmp_path / "out" / present]


class TestDownloadedCheckpointLoads:
    def test_downloaded_ckpt_imports_strict(self, bucket, tmp_path):
        """The full release pipeline: a Lightning `.ckpt` with the reference's
        `vae_model.`-prefixed state_dict is served over HTTP, downloaded via
        the registry, then imported strict (every key must map) through
        load_reference_checkpoint — the exact consume path for released
        checkpoints (_utils.py:336-370)."""
        import jax
        import jax.numpy as jnp

        from scldm_tpu.nn.vae import build_transformer_vae
        from scldm_tpu.utils.torch_import import (
            export_torch_state_dict,
            load_reference_checkpoint,
        )

        base_url, served, log = bucket
        jmodel = build_transformer_vae(
            n_genes=30, n_embed=16, n_embed_latent=8, n_layer=2,
            n_inducing_points=4, n_head=4, n_head_cross=2,
        )
        rng = np.random.default_rng(0)
        counts = jnp.asarray(rng.poisson(2.0, (3, 30)).astype(np.float32))
        genes = jnp.tile(jnp.arange(1, 31), (3, 1))
        lib = counts.sum(1, keepdims=True)
        template = jax.jit(jmodel.init)(
            jax.random.PRNGKey(0), counts, genes, lib, counts[:, :12], genes[:, :12]
        )

        # release a ckpt whose tensors are the template's (torch-exported),
        # so strict import back must reproduce them bit-exactly
        sd = export_torch_state_dict(template)
        key = "resubmission/dentate_gyrus_negative_binomial.ckpt"
        _make_lightning_ckpt(served / key, sd)

        out = tmp_path / "artifacts"
        got = download_artifacts(
            out, artifacts=[Artifact(key, "resubmission")], base_url=base_url
        )
        assert got == [out / key]

        loaded = load_reference_checkpoint(str(out / key), template, strict=True)
        flat_a = jax.tree_util.tree_leaves(template)
        flat_b = jax.tree_util.tree_leaves(loaded)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
