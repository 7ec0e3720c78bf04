"""Loader for the tdnative C++ extension: builds it on first use (g++ via
setuptools) into native/build and caches the .so; everything degrades to the
pure-Python implementations when compilation is unavailable."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "tdnative.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")

_lock = threading.Lock()
_module = None
_failed = False


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_BUILD_DIR, "tdnative" + suffix)


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    include = sysconfig.get_paths()["include"]
    so = _so_path()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", _SRC, "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception as e:  # compilation failure -> pure-Python fallback
        sys.stderr.write(f"[tdnative] build failed, using Python fallback: {e}\n")
        return False


def get_native():
    """Returns the tdnative module or None (Python fallback)."""
    global _module, _failed
    if _module is not None or _failed:
        return _module
    with _lock:
        if _module is not None or _failed:
            return _module
        so = _so_path()
        if not os.path.exists(so) and not (os.path.exists(_SRC) and _build()):
            _failed = True
            return None
        try:
            spec = importlib.util.spec_from_file_location("tdnative", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _module = mod
        except Exception as e:
            sys.stderr.write(f"[tdnative] load failed: {e}\n")
            _failed = True
    return _module
