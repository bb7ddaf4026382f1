"""Perturbation-conditioned generation quality (Parse1M/Replogle pattern).

Trains the two-stage pipeline with the JOINT condition strategy on synthetic
(cell_type x perturbation) data and scores conditional fidelity: per-combo
per-gene mean expression R^2 of conditionally generated vs real cells for the
same (type, pert) combination, against the cross-combo control (how well a
WRONG combo's real cells would score). Run:

    python -m benchmarks.quality_joint
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from benchmarks.quality_e2e import make_perturbation_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--genes", type=int, default=1000)
    p.add_argument("--cells", type=int, default=4096)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--ldm-epochs", type=int, default=80)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--out", default="QUALITY_joint.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from scldm_tpu.nn.nnets import DiT
    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.sampling.size_factors import SizeFactorSampler
    from scldm_tpu.training.ldm_task import LDMTask
    from scldm_tpu.training.metrics import r2_score
    from scldm_tpu.training.vae_task import VAETask
    from scldm_tpu.transport import create_transport

    rng = np.random.default_rng(0)
    n_types, n_perts = 4, 6
    counts, type_ids, pert_ids = make_perturbation_dataset(
        rng, args.cells, args.genes, n_types, n_perts
    )
    genes_row = np.arange(1, args.genes + 1, dtype=np.int64)

    def batches(counts, t_ids, p_ids, batch):
        out = []
        for lo in range(0, len(counts) - batch + 1, batch):
            c = counts[lo : lo + batch]
            gsub = np.zeros((batch, args.genes), np.int64)
            csub = np.zeros((batch, args.genes), np.float32)
            for i in range(batch):
                nz = np.nonzero(c[i])[0]
                gsub[i, : len(nz)] = genes_row[nz]
                csub[i, : len(nz)] = c[i, nz]
            out.append({
                "counts": c,
                "genes": np.broadcast_to(genes_row, c.shape),
                "library_size": c.sum(1, keepdims=True),
                "counts_subset": csub,
                "genes_subset": gsub,
                "cell_type": t_ids[lo : lo + batch].astype(np.int64),
                "perturbation": p_ids[lo : lo + batch].astype(np.int64),
            })
        return out

    bs = batches(counts, type_ids, pert_ids, args.batch)
    train_b = bs[: int(len(bs) * 0.9)]
    steps = args.epochs * len(train_b)

    vae = build_transformer_vae(n_genes=args.genes, dtype=jnp.bfloat16)
    vt = VAETask(vae, num_training_steps=steps)
    vs = vt.init_state(jax.random.PRNGKey(0), train_b[0])
    stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in train_b]) for k in train_b[0]}
    t0 = time.time()
    for e in range(args.epochs):
        vs, m = vt.train_steps(vs, stacked)
    print(f"VAE {args.epochs} epochs loss {float(m['train_loss']):.1f} ({time.time()-t0:.0f}s)", flush=True)

    vocab = {"cell_type": n_types, "perturbation": n_perts}
    dit = DiT(
        n_embed=256, n_embed_input=16, n_layer=8, n_head=8, seq_len=16,
        class_vocab_sizes=vocab, cfg_dropout_prob=0.5, condition_strategy="joint",
    )
    ldm_steps = args.ldm_epochs * len(train_b)
    ldm = LDMTask(vae, vs.params, dit, create_transport(),
                  num_training_steps=ldm_steps, ema_update_after_step=ldm_steps // 4)
    ls = ldm.init_state(jax.random.PRNGKey(1), train_b[0])
    t0 = time.time()
    for e in range(args.ldm_epochs):
        ls, m = ldm.train_steps(ls, stacked)
    print(f"LDM {args.ldm_epochs} epochs loss {float(m['train_loss']):.4f} ({time.time()-t0:.0f}s)", flush=True)

    # joint size-factor tables (flat stats here; the mechanism is what's tested)
    class _E:
        class_vocab_sizes = vocab
        mu_size_factor = {
            "cell_type_perturbation": {f"t{i}_p{j}": 8.6 for i in range(n_types) for j in range(n_perts)}
        }
        sd_size_factor = {
            "cell_type_perturbation": {f"t{i}_p{j}": 0.25 for i in range(n_types) for j in range(n_perts)}
        }
        joint_key = "cell_type_perturbation"
        joint_components = ["cell_type", "perturbation"]
        joint_idx_2_classes = {
            f"{i}_{j}": f"t{i}_p{j}" for i in range(n_types) for j in range(n_perts)
        }

    sfs = SizeFactorSampler(_E(), condition_strategy="joint")
    fn = ldm.make_sample_fn(
        sfs, guidance_weight={"cell_type": 1.5, "perturbation": 1.5},
        sampling_method="euler", num_steps=100, use_ema=False,
    )

    # generate a block of cells per (type, pert) combo and compare to the real
    # cells of that combo (per-gene mean R^2); control = best WRONG combo
    def scale(x):
        return np.log1p(x / np.maximum(x.sum(1, keepdims=True), 1.0) * 1e4)

    combos = [(i, j) for i in range(n_types) for j in range(n_perts)]
    gen_means, real_means = {}, {}
    B = 32  # cells per combo, all combos in ONE batched sampling call
    total = B * len(combos)
    genes = jnp.broadcast_to(jnp.asarray(genes_row), (total, args.genes))
    cond = {
        "cell_type": jnp.asarray(np.repeat([i for i, _ in combos], B).astype(np.int32)),
        "perturbation": jnp.asarray(np.repeat([j for _, j in combos], B).astype(np.int32)),
    }
    c, _ = fn(ls, jax.random.PRNGKey(500), genes, cond)
    cond_half = np.asarray(c[total:])  # conditional half
    for idx, (i, j) in enumerate(combos):
        gen_means[(i, j)] = scale(cond_half[idx * B : (idx + 1) * B]).mean(0)
        mask = (type_ids == i) & (pert_ids == j)
        real_means[(i, j)] = scale(counts[mask]).mean(0)

    # differential-expression correlation: combos share ~92% of the base
    # program, so compare per-combo deltas from the global mean — the part the
    # conditioning must actually control
    gen_global = np.mean([gen_means[c] for c in combos], axis=0)
    real_global = np.mean([real_means[c] for c in combos], axis=0)

    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    same, cross, match, type_match, pert_match = [], [], 0, 0, 0
    for combo in combos:
        dg = gen_means[combo] - gen_global
        scores = {o: corr(dg, real_means[o] - real_global) for o in combos}
        best = max(scores, key=scores.get)
        same_c = scores[combo]
        same.append(same_c)
        cross.append(max(v for o, v in scores.items() if o != combo))
        match += best == combo
        type_match += best[0] == combo[0]
        pert_match += best[1] == combo[1]
    n = len(combos)
    out = {
        "de_corr_same_combo_mean": float(np.mean(same)),
        "de_corr_best_wrong_combo_mean": float(np.mean(cross)),
        "combo_identification_accuracy": match / n,
        "cell_type_identification_accuracy": type_match / n,  # chance 1/4
        "perturbation_identification_accuracy": pert_match / n,  # chance 1/6
        "combos": n,
    }
    print(json.dumps(out, indent=2))
    Path(args.out).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
