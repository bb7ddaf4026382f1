"""End-to-end pipeline test through the CLI entry points: VAE training ->
LDM training on the frozen VAE -> CFG generation -> latent inference.

The JAX analog of the reference's requires_local_data integration test
(tests/test_load.py), but self-contained on synthetic data."""

import json

import numpy as np
import pytest

from scldm_tpu.data.h5ad import H5ADFile, write_h5ad

N, G = 96, 24


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    X = rng.poisson(1.0, size=(N, G)).astype(np.float32)
    clusters = rng.choice([f"c{i}" for i in range(14)], size=N)
    write_h5ad(
        tmp / "train.h5ad", X, obs={"clusters": clusters},
        var_names=[f"g{i}" for i in range(G)],
    )
    payload = {
        "genes": [f"g{i}" for i in range(G)],
        "labels": {"clusters": [f"c{i}" for i in range(14)]},
    }
    (tmp / "meta.json").write_text(json.dumps(payload))
    mu = {"clusters": {f"c{i}": 3.5 for i in range(14)}}
    sd = {"clusters": {f"c{i}": 0.1 for i in range(14)}}
    (tmp / "mu.json").write_text(json.dumps(mu))
    (tmp / "sd.json").write_text(json.dumps(sd))
    return tmp


def _common_overrides(tmp):
    return [
        f"datamodule.datamodule.train_adata_path={tmp / 'train.h5ad'}",
        f"datamodule.dataset_params.dentate_gyrus.metadata_json={tmp / 'meta.json'}",
        f"datamodule.dataset_params.dentate_gyrus.n_genes={G}",
        f"datamodule.dataset_params.dentate_gyrus.genes_seq_len={G}",
        f"datamodule.dataset_params.dentate_gyrus.mu_size_factor={tmp / 'mu.json'}",
        f"datamodule.dataset_params.dentate_gyrus.sd_size_factor={tmp / 'sd.json'}",
        f"paths.output_path={tmp / 'outputs'}",
        f"paths.inference_path={tmp / 'outputs' / 'inference'}",
        "model.batch_size=16",
        "model.test_batch_size=8",
        "model.compute_dtype=float32",
        "epochs=2",
        "datamodule.datamodule.prefetch=0",
        "training.log_every_steps=5",
        # tiny model
        "model.vae.n_embed=16",
        "model.vae.n_embed_latent=8",
        "model.vae.n_layer=1",
        "model.vae.n_inducing_points=4",
        "model.vae.n_head=2",
        "model.vae.n_head_cross=2",
    ]


def test_vae_training_cli(workspace):
    from scldm_tpu.cli.train import main

    rc = main(_common_overrides(workspace))
    assert rc == 0
    ckpt = workspace / "outputs" / "checkpoints" / "vae_dentate_gyrus"
    assert ckpt.exists()
    assert (ckpt / "config.json").exists()
    assert (ckpt / "metrics.csv").exists()


def test_vae_training_profile_capture(workspace):
    """training.profile_dir captures a jax-profiler trace of the first
    post-compile dispatches (SURVEY §5 tracing subsystem — no reference
    analog; the loop wiring is scldm_tpu/training/loop.py StepProfiler)."""
    from scldm_tpu.cli.train import main

    profile_dir = workspace / "trace"
    overrides = _common_overrides(workspace) + [
        f"paths.output_path={workspace / 'outputs_profiled'}",
        f"training.profile_dir={profile_dir}",
        "training.profile_steps=2",
        "epochs=1",
    ]
    rc = main(overrides)
    assert rc == 0
    # jax writes plugins/profile/<ts>/<host>.xplane.pb under the log dir
    captured = list(profile_dir.rglob("*.xplane.pb"))
    assert captured, f"no trace files under {profile_dir}"


def test_extract_metadata_cli_full_circle(workspace, tmp_path):
    """README quickstart step 0 verbatim: extract_metadata produces the
    metadata JSON + size-factor stats that the VocabularyEncoder and the
    training CLI consume directly (reference scripts/extract_metadata.py)."""
    from scldm_tpu.cli.extract_metadata import main as extract_main
    from scldm_tpu.cli.train import main as train_main

    out_json = tmp_path / "meta_extracted.json"
    rc = extract_main([
        str(workspace / "train.h5ad"), "--labels", "clusters",
        "--out", str(out_json), "--size-factors-out", str(tmp_path / "ds"),
    ])
    assert rc == 0
    meta = json.loads(out_json.read_text())
    assert len(meta["genes"]) == G and set(meta["labels"]) == {"clusters"}
    mu = json.loads((tmp_path / "ds_log_size_factor_mu.json").read_text())
    sd = json.loads((tmp_path / "ds_log_size_factor_sd.json").read_text())
    # every category present in the data must have finite stats
    assert mu["clusters"] and sd["clusters"]
    assert all(np.isfinite(v) for v in mu["clusters"].values())
    assert all(v > 0 for v in sd["clusters"].values())

    # the extracted artifacts drive training unchanged
    overrides = [
        o for o in _common_overrides(workspace)
        if "metadata_json" not in o and "size_factor" not in o
    ] + [
        f"datamodule.dataset_params.dentate_gyrus.metadata_json={out_json}",
        f"datamodule.dataset_params.dentate_gyrus.mu_size_factor={tmp_path / 'ds_log_size_factor_mu.json'}",
        f"datamodule.dataset_params.dentate_gyrus.sd_size_factor={tmp_path / 'ds_log_size_factor_sd.json'}",
        f"paths.output_path={tmp_path / 'outputs'}",
        "epochs=1",
    ]
    assert train_main(overrides) == 0


def test_scvi_training_cli(workspace):
    """The third trainer entry point (reference models.VAEScvi via train.py)
    end to end: config compose -> MLP-VAE ELBO training -> checkpoints."""
    from pathlib import Path

    from scldm_tpu.cli.train_scvi import main

    config = Path(__file__).parent.parent / "configs" / "vae_scvi_training.yaml"
    overrides = [
        o for o in _common_overrides(workspace) if not o.startswith("model.vae.")
    ] + [
        f"paths.output_path={workspace / 'outputs_scvi'}",
        "model.scvi.n_hidden=16",
        "model.scvi.n_latent=4",
        "epochs=1",
    ]
    rc = main(["--config", str(config)] + overrides)
    assert rc == 0
    ckpt = workspace / "outputs_scvi" / "checkpoints" / "scvi_dentate_gyrus"
    assert (ckpt / "config.json").exists()
    assert (ckpt / "metrics.csv").exists()
    steps = [int(p.name) for p in ckpt.iterdir() if p.name.isdigit()]
    assert steps, "no checkpoint written"


def test_ldm_training_cli(workspace):
    from scldm_tpu.cli.train_ldm import main

    overrides = _common_overrides(workspace) + [
        "model.diffusion_model.n_embed=32",
        "model.diffusion_model.n_layer=1",
        "model.diffusion_model.n_head=2",
        "model.ema.update_after_step=0",
        "model.ema.update_every=1",
    ]
    rc = main(overrides)
    assert rc == 0
    ckpt = workspace / "outputs" / "checkpoints" / "ldm_dentate_gyrus"
    assert ckpt.exists()
    cfg = json.loads((ckpt / "config.json").read_text())
    # VAE architecture grafted from the VAE checkpoint (n_embed override kept)
    assert cfg["model"]["vae"]["n_embed"] == 16
    assert cfg["model"]["diffusion_model"]["n_embed_input"] == 8
    assert cfg["model"]["diffusion_model"]["seq_len"] == 4


def test_ldm_in_training_generation_eval(workspace, tmp_path):
    """model.eval_generation.enabled=true: the periodic generation eval
    (reference models.py:849-939) samples from the EMA model during
    validation and logs MMD/W2/R2 rows to generation_eval.csv."""
    import csv

    from scldm_tpu.cli.train_ldm import main

    vae_ckpt = workspace / "outputs" / "checkpoints" / "vae_dentate_gyrus"
    if not vae_ckpt.exists():  # standalone run: train the VAE first
        from scldm_tpu.cli.train import main as train_vae

        assert train_vae(_common_overrides(workspace)) == 0

    overrides = _common_overrides(workspace) + [
        f"paths.output_path={tmp_path / 'outputs'}",
        # reuse the VAE trained by test_vae_training_cli in the module workspace
        f"vae_checkpoint_dir={workspace / 'outputs' / 'checkpoints' / 'vae_dentate_gyrus'}",
        "model.diffusion_model.n_embed=32",
        "model.diffusion_model.n_layer=1",
        "model.diffusion_model.n_head=2",
        "model.ema.update_after_step=0",
        "model.ema.update_every=1",
        "model.eval_generation.enabled=true",
        "model.eval_generation.freq=1",
        "model.eval_generation.warmup_epochs=0",
        "model.eval_generation.sample_size=16",
        "model.eval_generation.timesteps=4",
        "model.eval_generation.sampling_method=euler",
        "epochs=2",  # eval fires at epoch 1 (gate requires epoch > 0)
        "datamodule.datamodule.val_fraction=0.2",
    ]
    rc = main(overrides)
    assert rc == 0
    csv_path = tmp_path / "outputs" / "checkpoints" / "ldm_dentate_gyrus" / "generation_eval.csv"
    assert csv_path.exists(), "generation eval never ran"
    rows = list(csv.DictReader(csv_path.open()))
    assert rows, "no eval rows logged"
    vals = {k: float(v) for k, v in rows[-1].items() if v}
    assert any(k.startswith("gen/") or "mmd" in k for k in vals), vals
    assert all(np.isfinite(v) for v in vals.values()), vals


def test_generation_cli(workspace):
    from pathlib import Path

    from scldm_tpu.cli.inference import main

    config = Path(__file__).parent.parent / "configs" / "generation.yaml"
    overrides = _common_overrides(workspace) + [
        "model.diffusion_model.n_embed=32",
        "model.diffusion_model.n_layer=1",
        "model.diffusion_model.n_head=2",
        "generation_args.timesteps=4",
        "generation_args.sampling_method=euler",
        "generation_args.n_batches=1",
        # (4,2) mesh over the 8 virtual devices: exercises the gene-axis-
        # sharded (sequence-parallel) generation decode through the CLI
        "n_model=2",
        "datamodule.datamodule.val_as_test=false",
        f"datamodule.datamodule.test_adata_path={workspace / 'train.h5ad'}",
    ]
    rc = main(["--config", str(config)] + overrides)
    assert rc == 0
    out = list((workspace / "outputs" / "inference").glob("*generated*.h5ad"))
    assert len(out) == 1
    f = H5ADFile(out[0])
    assert f.n_vars == G
    gen_type = f.obs_column("generation_type")
    assert set(gen_type) == {"unconditional", "conditional"}
    counts = f.rows(slice(0, f.n_obs))
    assert (counts >= 0).all()
    # decoded condition labels present
    assert all(str(c).startswith("c") for c in f.obs_column("clusters"))


def test_inference_cli(workspace):
    from pathlib import Path

    from scldm_tpu.cli.inference import main

    config = Path(__file__).parent.parent / "configs" / "inference.yaml"
    overrides = _common_overrides(workspace) + [
        "model.diffusion_model.n_embed=32",
        "model.diffusion_model.n_layer=1",
        "model.diffusion_model.n_head=2",
        f"datamodule.datamodule.test_adata_path={workspace / 'train.h5ad'}",
    ]
    rc = main(["--config", str(config)] + overrides)
    assert rc == 0
    out = list((workspace / "outputs" / "inference").glob("*inference*.h5ad"))
    assert len(out) >= 1
    f = H5ADFile(out[0])
    assert f.n_vars == G


def test_vae_only_inference_cli(workspace):
    from pathlib import Path

    from scldm_tpu.cli.inference import main

    config = Path(__file__).parent.parent / "configs" / "inference.yaml"
    overrides = _common_overrides(workspace) + [
        "vae_only=true",
        f"datamodule.datamodule.test_adata_path={workspace / 'train.h5ad'}",
        f"paths.inference_path={workspace / 'outputs' / 'vae_inference'}",
    ]
    rc = main(["--config", str(config)] + overrides)
    assert rc == 0
    out = list((workspace / "outputs" / "vae_inference").glob("*inference*.h5ad"))
    assert len(out) >= 1
    f = H5ADFile(out[0])
    assert f.n_vars == G
    assert (f.rows(slice(0, f.n_obs)) >= 0).all()


def test_census_inference_example(tmp_path):
    """The documented census OOD flow (reference inference_census.ipynb):
    symbol->Ensembl mapping, vocabulary filtering, latent + reconstruction
    inference, h5ad output."""
    from examples.census_inference import main as census_main

    rc = census_main(["--workdir", str(tmp_path)])
    assert rc == 0
    out = H5ADFile(tmp_path / "census_inference.h5ad")
    assert out.n_obs == 64
    assert all(str(n).startswith("ENSG") for n in out.var_names[:5])
