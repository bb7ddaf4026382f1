"""On-demand g++ build + ctypes loader for the native CSR packer."""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import tempfile
from pathlib import Path

import numpy as np
from numpy.ctypeslib import ndpointer

_SRC = Path(__file__).parent / "_fastpack.cpp"


def _so_path() -> Path:
    tag = hashlib.md5(_SRC.read_bytes()).hexdigest()[:12]
    return Path(tempfile.gettempdir()) / f"scldm_fastpack_{tag}.so"


def build() -> Path:
    so = _so_path()
    if not so.exists():
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(so)],
            check=True,
            capture_output=True,
        )
    return so


def load():
    """Return the typed ctypes entry point (raises if toolchain unavailable)."""
    lib = ctypes.CDLL(str(build()))
    fn = lib.fastpack_expressed
    f32 = ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64 = ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32 = ndpointer(np.int32, flags="C_CONTIGUOUS")
    fn.argtypes = [
        f32, i64, i64, i64,  # data, indices, indptr, gene_row
        f32, i32, f32, f32,  # counts, genes_sub(int32), counts_sub, library
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    fn.restype = None
    return fn
