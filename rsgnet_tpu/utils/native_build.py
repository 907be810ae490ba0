"""Shared build-on-demand loader for the csrc/ native host libraries.

One policy, used by every ctypes binding (``ops/nms_native.py``,
``utils/native_jpeg.py``) so subtle load/rebuild rules cannot drift between
copies: rebuild when the source is newer than the binary, retry a failed
``CDLL`` once after a rebuild, and degrade to ``None`` (pure-Python
fallback) when no toolchain exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build(lib_path: str, src: str, make_target: str,
           extra_link: tuple) -> bool:
    try:
        subprocess.run(["make", "-C", CSRC, make_target], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", lib_path, src, *extra_link],
                check=True, capture_output=True)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False


def load_native_lib(lib_name: str, src_name: str,
                    extra_link: tuple = ()):
    """``ctypes.CDLL`` for ``csrc/<lib_name>``, building from
    ``csrc/<src_name>`` on demand (make target = ``lib_name``, direct g++
    as fallback). Returns ``None`` when unavailable. Policy:

    - rebuild when the source is NEWER than the binary — a stale binary
      would silently keep old semantics; fall back to the existing binary
      only when no compiler exists at all;
    - if ``CDLL`` fails (foreign-arch / corrupt binary), delete + rebuild
      once, then give up to the caller's pure-Python fallback.

    Callers hold their own lock/cache and attach argtypes to the result.
    Grain/multiprocess data-loader workers share one csrc/ directory, so the
    whole check-build-load sequence holds an inter-process ``flock`` — a
    worker can neither dlopen a half-written library nor delete one a
    sibling just finished building.
    """
    lib_path = os.path.join(CSRC, lib_name)
    src = os.path.join(CSRC, src_name)
    try:
        lock_f = open(os.path.join(CSRC, ".build.lock"), "a+")
    except OSError:
        lock_f = None                      # read-only checkout: no lock, but
    try:                                   # then nobody can build/delete
        if lock_f is not None:
            import fcntl
            fcntl.flock(lock_f, fcntl.LOCK_EX)
        stale = (os.path.exists(lib_path) and os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(lib_path))
        if ((stale or not os.path.exists(lib_path))
                and not _build(lib_path, src, lib_name, extra_link)):
            if not os.path.exists(lib_path):
                return None
        try:
            return ctypes.CDLL(lib_path)
        except OSError:
            try:
                os.remove(lib_path)
            except OSError:
                pass
            if not _build(lib_path, src, lib_name, extra_link):
                return None
            try:
                return ctypes.CDLL(lib_path)
            except OSError:
                return None
    finally:
        if lock_f is not None:
            lock_f.close()                 # closing releases the flock
