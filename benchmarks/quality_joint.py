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

from benchmarks.provenance import provenance as _provenance

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from benchmarks.quality_e2e import make_perturbation_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--genes", type=int, default=1000)
    p.add_argument("--cells", type=int, default=4096)
    # the VAE latent must retain the (weak, 5%-of-genes) perturbation program
    # for conditional generation to have anything to condition on — at 150
    # epochs the latent carries only ~0.5 linear pert separability (vs 1.0 in
    # raw data) and generation degenerates to chance; both stages need the
    # longer schedules below (see VERDICT round 1, weak #4)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--ldm-epochs", type=int, default=300)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--gen-per-combo", type=int, default=64)
    p.add_argument("--guidance", type=float, nargs="*", default=[1.5, 3.0])
    p.add_argument("--out", default="QUALITY_joint.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from scldm_tpu.nn.nnets import DiT
    from scldm_tpu.nn.vae import build_transformer_vae
    from scldm_tpu.sampling.size_factors import SizeFactorSampler
    from scldm_tpu.training.ldm_task import LDMTask
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

    # latent diagnostic: linear separability of each condition in the latent —
    # the ceiling on what ANY conditional generator on this latent can achieve
    enc = jax.jit(lambda p, b: vt.encode(p, b))
    Z = np.concatenate([
        np.asarray(enc(vs.params, {k: jnp.asarray(v) for k, v in b.items()})).reshape(len(b["counts"]), -1)
        for b in bs
    ])
    nz = Z.shape[0]
    idx = np.arange(nz); np.random.default_rng(1).shuffle(idx)
    tr_i, te_i = idx[: nz // 2], idx[nz // 2:]

    def ridge_probe(labels, k):
        Y = np.eye(k)[labels[tr_i]]
        X = np.concatenate([Z[tr_i], np.ones((len(tr_i), 1))], 1)
        W = np.linalg.solve(X.T @ X + 1e-3 * np.eye(X.shape[1]), X.T @ Y)
        Xt = np.concatenate([Z[te_i], np.ones((len(te_i), 1))], 1)
        return float(((Xt @ W).argmax(1) == labels[te_i]).mean())

    probe_type = ridge_probe(type_ids[:nz], n_types)
    probe_pert = ridge_probe(pert_ids[:nz], n_perts)
    print(f"latent probe: type {probe_type:.3f}  pert {probe_pert:.3f}", flush=True)

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

    # generate a block of cells per (type, pert) combo and compare to the real
    # cells of that combo (per-gene mean DE corr); control = best WRONG combo
    def scale(x):
        return np.log1p(x / np.maximum(x.sum(1, keepdims=True), 1.0) * 1e4)

    combos = [(i, j) for i in range(n_types) for j in range(n_perts)]
    B = args.gen_per_combo  # cells per combo, all combos in ONE sampling call
    total = B * len(combos)
    genes = jnp.broadcast_to(jnp.asarray(genes_row), (total, args.genes))
    cond = {
        "cell_type": jnp.asarray(np.repeat([i for i, _ in combos], B).astype(np.int32)),
        "perturbation": jnp.asarray(np.repeat([j for _, j in combos], B).astype(np.int32)),
    }
    real_means = {}
    for i, j in combos:
        mask = (type_ids == i) & (pert_ids == j)
        real_means[(i, j)] = scale(counts[mask]).mean(0)
    real_global = np.mean([real_means[c] for c in combos], axis=0)

    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    def evaluate(w):
        fn = ldm.make_sample_fn(
            sfs, guidance_weight={"cell_type": w, "perturbation": w},
            sampling_method="euler", num_steps=100, use_ema=True,
        )
        c, _ = fn(ls, jax.random.PRNGKey(500), genes, cond)
        cond_half = np.asarray(c[total:])  # conditional half
        gen_means = {
            combo: scale(cond_half[k * B : (k + 1) * B]).mean(0)
            for k, combo in enumerate(combos)
        }
        gen_global = np.mean([gen_means[c] for c in combos], axis=0)
        same, cross, match, type_match, pert_match = [], [], 0, 0, 0
        for combo in combos:
            dg = gen_means[combo] - gen_global
            scores = {o: corr(dg, real_means[o] - real_global) for o in combos}
            best = max(scores, key=scores.get)
            same.append(scores[combo])
            cross.append(max(v for o, v in scores.items() if o != combo))
            match += best == combo
            type_match += best[0] == combo[0]
            pert_match += best[1] == combo[1]
        n = len(combos)
        return {
            "de_corr_same_combo_mean": float(np.mean(same)),
            "de_corr_best_wrong_combo_mean": float(np.mean(cross)),
            "combo_identification_accuracy": match / n,
            "cell_type_identification_accuracy": type_match / n,  # chance 1/4
            "perturbation_identification_accuracy": pert_match / n,  # chance 1/6
        }

    by_weight = {}
    for w in args.guidance:
        by_weight[w] = evaluate(w)
        print(f"guidance {w}: {json.dumps(by_weight[w])}", flush=True)
    best_w = max(
        by_weight, key=lambda w: by_weight[w]["combo_identification_accuracy"]
    )
    out = {
        "provenance": _provenance(),
        **by_weight[best_w],
        "guidance_weight": best_w,
        "combos": len(combos),
        "latent_probe_type": probe_type,
        "latent_probe_pert": probe_pert,
        "by_guidance": {str(w): v for w, v in by_weight.items()},
    }
    print(json.dumps(out, indent=2))
    Path(args.out).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
