"""Native C++ extensions, compiled on demand with g++ (no pybind11).

Extensions are cached next to their sources as _<name>.so and rebuilt when
the source is newer. Loading failures degrade gracefully to the Python
fallbacks in the calling modules.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build_ext(name: str, sources) -> str:
    so_path = os.path.join(_DIR, f"_{name}.so")
    src_paths = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(so_path) and all(
        os.path.getmtime(so_path) >= os.path.getmtime(s) for s in src_paths
    ):
        return so_path
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-fopenmp", f"-I{include}", *src_paths, "-o", so_path,
    ]
    subprocess.check_call(cmd)
    return so_path


class _CliquesExt:
    def __init__(self, module):
        self._m = module

    def enumerate_cliques(self, n: int, v1: np.ndarray, v2: np.ndarray):
        flat_b, off_b = self._m.enumerate_cliques_raw(
            n, np.ascontiguousarray(v1, dtype=np.int64),
            np.ascontiguousarray(v2, dtype=np.int64))
        flat = np.frombuffer(flat_b, dtype=np.int64)
        offsets = np.frombuffer(off_b, dtype=np.int64)
        return flat, offsets


_cliques_ext: Optional[_CliquesExt] = None
_cliques_failed = False


def load_cliques_ext() -> Optional[_CliquesExt]:
    global _cliques_ext, _cliques_failed
    if _cliques_ext is not None or _cliques_failed:
        return _cliques_ext
    try:
        import importlib.util

        so_path = _build_ext("cliques", ["cliques.cpp"])
        spec = importlib.util.spec_from_file_location("_cliques", so_path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        _cliques_ext = _CliquesExt(module)
    except Exception:
        _cliques_failed = True
        _cliques_ext = None
    return _cliques_ext
