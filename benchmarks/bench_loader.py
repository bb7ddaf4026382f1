#!/usr/bin/env python
"""Host-loader throughput: the h5ad -> CSR tokenize -> lean uint16 pipeline
alone (no device), swept over worker counts.

    python -m benchmarks.bench_loader [--workers 1 2 4 8] [--cells 12288]

Emits one JSON line per worker count. Rationale: one producer thread
sustains ~10k cells/s at dentate shapes — ample for a single chip (~3.2k)
but not for an 8-chip DP host (~26k); the order-preserving worker pool
(DataModule(workers=N)) is the lever, and this benchmark is its artifact
(pure host work, so the numbers are meaningful on any machine).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--cells", type=int, default=12_288)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dense", action="store_true",
                    help="dense transfer mode (default: lean uint16)")
    args = ap.parse_args(argv)

    # reuse the headline bench's cached dentate-shaped synthetic dataset
    import bench as headline_bench

    headline_bench.E2E_CELLS = args.cells
    root = headline_bench._e2e_dataset_path()

    from scldm_tpu.data.datamodule import DataModule
    from scldm_tpu.data.encoder import VocabularyEncoder

    vocab = VocabularyEncoder(
        metadata_json=str(root / "meta.json"),
        n_genes=headline_bench.N_GENES,
        class_vocab_sizes={"clusters": 14},
    )
    base = None
    for w in args.workers:
        dm = DataModule(
            vocabulary_encoder=vocab,
            train_adata_path=str(root / "dentate_synth.h5ad"),
            batch_size=args.batch,
            genes_seq_len=headline_bench.SEQ_LEN,
            sample_genes="expressed",
            dense_transfer=args.dense,
            val_fraction=0.0,
            prefetch=4,
            workers=w,
        )
        dm.setup()
        n = 0
        # warm epoch primes the shard pool + per-file caches
        for b in dm.train_batches(0):
            n += b["library_size"].shape[0]
        t0 = time.perf_counter()
        n = 0
        for b in dm.train_batches(1):
            n += b["library_size"].shape[0]
        dt = time.perf_counter() - t0
        rate = n / dt
        base = base or rate
        import os

        print(json.dumps({
            "metric": "loader_cells_per_sec",
            "workers": w,
            "value": round(rate, 1),
            "unit": "cells/s (host only, lean)" if not args.dense else "cells/s (host only, dense)",
            "scaling_vs_1worker": round(rate / base, 2),
            # scaling is only meaningful when there are cores to scale onto
            # (TPU-pod hosts have dozens; this dev container has 1)
            "host_cpus": os.cpu_count(),
        }), flush=True)


if __name__ == "__main__":
    main()
