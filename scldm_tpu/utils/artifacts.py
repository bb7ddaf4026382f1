"""Released-artifact downloader (reference src/scldm/download_artifacts.py).

Declarative artifact registry over the public unsigned S3 bucket
(`s3://czi-scldm`), downloaded over plain HTTPS (no boto3 in this image) with
md5/ETag skip logic. Grouped like the reference: `datasets` (processed h5ad),
`resubmission` (per-dataset LDM checkpoints + size-factor pickles), and
`vae_census` (census VAE checkpoints at 20M/70M/270M).

NOTE: network egress may be unavailable in sandboxed environments; every
download is individually try/except'd and reported.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.request
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

from scldm_tpu.utils.logger import logger

# Overridable for mirrors / proxies / offline test fixtures
# (SCLDM_ARTIFACTS_URL or the base_url parameter).
BUCKET_URL = os.environ.get(
    "SCLDM_ARTIFACTS_URL", "https://czi-scldm.s3.amazonaws.com"
)

DATASETS = ["dentate_gyrus", "hlca", "tabula_muris", "parse1m", "replogle"]
HEAD_VARIANTS = ["gaussian", "negative_binomial"]
CENSUS_SIZES = ["20M", "70M", "270M"]


@dataclass
class Artifact:
    key: str  # S3 object key
    group: str  # datasets | resubmission | vae_census
    dest: Optional[str] = None  # local relative path (defaults to key)


def default_artifacts() -> List[Artifact]:
    arts: List[Artifact] = []
    for ds in DATASETS:
        arts.append(Artifact(f"datasets/{ds}_train.h5ad", "datasets"))
        arts.append(Artifact(f"datasets/{ds}_test.h5ad", "datasets"))
        for head in HEAD_VARIANTS:
            arts.append(Artifact(f"resubmission/{ds}_{head}.ckpt", "resubmission"))
            arts.append(Artifact(f"resubmission/{ds}_{head}_config.yaml", "resubmission"))
        arts.append(Artifact(f"resubmission/{ds}_log_size_factor_mu.pkl", "resubmission"))
        arts.append(Artifact(f"resubmission/{ds}_log_size_factor_sd.pkl", "resubmission"))
    for size in CENSUS_SIZES:
        arts.append(Artifact(f"vae_census/census_vae_{size}.ckpt", "vae_census"))
    return arts


def _md5(path: Path) -> str:
    h = hashlib.md5()
    with path.open("rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_artifacts(
    output_dir: str | Path,
    groups: Optional[List[str]] = None,
    datasets: Optional[List[str]] = None,
    artifacts: Optional[List[Artifact]] = None,
    base_url: Optional[str] = None,
) -> List[Path]:
    """Download (or skip-by-ETag) the selected artifact groups."""
    out = Path(output_dir)
    root = (base_url or BUCKET_URL).rstrip("/")
    done: List[Path] = []
    for art in artifacts or default_artifacts():
        if groups and art.group not in groups:
            continue
        if datasets and not any(ds in art.key for ds in datasets):
            continue
        dest = out / (art.dest or art.key)
        dest.parent.mkdir(parents=True, exist_ok=True)
        url = f"{root}/{art.key}"
        try:
            req = urllib.request.Request(url, method="HEAD")
            with urllib.request.urlopen(req, timeout=30) as resp:
                etag = resp.headers.get("ETag", "").strip('"')
            if dest.exists() and etag and _md5(dest) == etag:
                logger.info(f"skip (up-to-date): {art.key}")
                done.append(dest)
                continue
            logger.info(f"downloading {url}")
            urllib.request.urlretrieve(url, dest)
            done.append(dest)
        except Exception as e:  # keep going on per-file failures
            logger.warning(f"failed {art.key}: {e}")
    return done


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output-dir", default="artifacts")
    p.add_argument("--groups", nargs="*", default=None,
                   choices=["datasets", "resubmission", "vae_census"])
    p.add_argument("--datasets", nargs="*", default=None)
    p.add_argument("--base-url", default=None,
                   help="override the bucket endpoint (mirror/proxy)")
    a = p.parse_args(argv if argv is not None else sys.argv[1:])
    paths = download_artifacts(a.output_dir, a.groups, a.datasets, base_url=a.base_url)
    logger.info(f"{len(paths)} artifacts present")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
