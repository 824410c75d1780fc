"""Shared lazy build-and-load for the native C++ kernels.

One implementation of the scaffolding both ctypes loaders need
(detr_tpu/data/_native.py, detr_tpu/eval/_native.py), fixing as a unit the
failure modes the per-loader copies had:

  * the cache filename is keyed on (HOST ISA, SOURCE CONTENT):
    ``lib<stem>.<host-tag>.<src-hash>.so``.  A ``-march=native`` artifact
    can never SIGILL on a different CPU (foreign host -> different tag ->
    rebuild), and a source edit can never be served a stale library —
    crucially, NOT even within a live process: glibc's dlopen caches by
    path, so rebuilding into the SAME filename would keep returning the
    old symbols (measured), while a content-keyed name dlopens fresh;
  * concurrent builds (spawn-pool workers, parallel pytest) compile into a
    per-pid temp file and atomically ``os.replace`` it in, with the temp
    unlinked on every failure path;
  * superseded variants for the same stem are opportunistically unlinked
    after a successful build (unlink-while-loaded is safe on Linux).
"""

from __future__ import annotations

import ctypes
import glob
import hashlib
import os
import platform
import subprocess
import threading
from typing import Callable, Optional, Sequence


def _host_tag() -> str:
    """Stable per-ISA tag: machine arch + the CPU flags line."""
    key = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    key += line
                    break
    except OSError:
        pass
    return hashlib.sha1(key.encode()).hexdigest()[:10]


class NativeLib:
    """Lazy builder/loader for one source file.

    ``bind(lib)`` sets argtypes/restypes; ``flag_sets`` are tried in order
    (each with each of g++/clang++/c++) until one compiles.
    """

    def __init__(
        self,
        src: str,
        flag_sets: Sequence[Sequence[str]],
        bind: Callable[[ctypes.CDLL], None],
    ):
        self._src = src
        self._stem, _ = os.path.splitext(os.path.basename(src))
        self._flag_sets = [list(fs) for fs in flag_sets]
        self._bind = bind
        self._lock = threading.Lock()
        self._lib: Optional[ctypes.CDLL] = None
        self._tried = False

    def _lib_path(self) -> str:
        with open(self._src, "rb") as f:
            src_hash = hashlib.sha1(f.read()).hexdigest()[:10]
        return os.path.join(
            os.path.dirname(self._src),
            f"lib{self._stem}.{_host_tag()}.{src_hash}.so",
        )

    def _build(self) -> Optional[str]:
        out = self._lib_path()
        if os.path.exists(out):
            return out
        tmp = f"{out}.{os.getpid()}.tmp"
        try:
            for cxx in ("g++", "clang++", "c++"):
                for extra in self._flag_sets:
                    try:
                        subprocess.run(
                            [cxx, "-O3", "-shared", "-fPIC", *extra,
                             "-o", tmp, self._src],
                            check=True,
                            capture_output=True,
                            timeout=120,
                        )
                        os.replace(tmp, out)
                        self._cleanup_superseded(keep=out)
                        return out
                    except (OSError, subprocess.SubprocessError):
                        continue
            return None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def _cleanup_superseded(self, keep: str) -> None:
        pattern = os.path.join(
            os.path.dirname(self._src), f"lib{self._stem}.*.so"
        )
        for path in glob.glob(pattern):
            if path != keep:
                try:
                    os.unlink(path)
                except OSError:
                    pass

    def load(self) -> Optional[ctypes.CDLL]:
        with self._lock:
            if self._tried:
                return self._lib
            self._tried = True
            if not os.path.exists(self._src):
                return None
            path = self._build()
            if path is None:
                return None
            try:
                lib = ctypes.CDLL(path)
                self._bind(lib)
                self._lib = lib
            except (OSError, AttributeError):
                self._lib = None
            return self._lib
