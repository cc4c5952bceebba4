"""Shared build step for the ctypes-bound native bridges: compile a C++
translation unit to a shared library with g++ on first import, cached by
mtime next to the source (no pybind11/cmake in this image)."""

import ctypes
import os
import subprocess


def load_native(src_path: str, lib_path: str) -> ctypes.CDLL:
    if not (os.path.exists(lib_path)
            and os.path.getmtime(lib_path) >= os.path.getmtime(src_path)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src_path,
             "-o", lib_path],
            check=True, capture_output=True)
    return ctypes.CDLL(lib_path)
