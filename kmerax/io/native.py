"""ctypes loader + auto-build for the C++ FASTQ extension (SURVEY.md §2 #5).

Builds _fastq_ext.so from _fastq_ext.cc with g++ on first use (cached next to
the source; rebuilt when the source is newer). Everything degrades to the
pure-Python parser if no compiler is available — set KMERAX_NO_NATIVE=1 to
force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from kmerax.utils.logging import get_logger

log = get_logger("kmerax.io.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_fastq_ext.cc")
_SO = os.path.join(_HERE, "_fastq_ext.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO + ".tmp", _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        log.warning("native FASTQ ext build failed (%s); using Python parser",
                    e)
        return False


def get_lib():
    """The loaded extension, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("KMERAX_NO_NATIVE"):
        return None
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        log.warning("native FASTQ ext load failed (%s)", e)
        return None
    lib.kmerax_fastq_parse.restype = ctypes.c_long
    lib.kmerax_fastq_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_long)]
    _lib = lib
    return _lib


def parse_chunk(buf: bytes, cap_records: int, max_len: int):
    """Parse complete FASTQ records from a bytes chunk via the C++ parser.

    Returns (bases (n, max_len) int8, lengths (n,), names list[bytes],
    quals list[bytes], pluses list[bytes], consumed_bytes). Raises ValueError
    on malformed input (same conditions as the Python parser).
    """
    lib = get_lib()
    assert lib is not None
    bases = np.empty((cap_records, max_len), dtype=np.int8)
    lengths = np.empty(cap_records, dtype=np.int32)
    name_off = np.empty(cap_records, dtype=np.int64)
    name_len = np.empty(cap_records, dtype=np.int32)
    qual_off = np.empty(cap_records, dtype=np.int64)
    qual_len = np.empty(cap_records, dtype=np.int32)
    plus_off = np.empty(cap_records, dtype=np.int64)
    plus_len = np.empty(cap_records, dtype=np.int32)
    consumed = ctypes.c_long(0)
    n = lib.kmerax_fastq_parse(
        buf, len(buf), cap_records, max_len,
        bases.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        name_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        name_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qual_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        qual_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        plus_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        plus_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(consumed))
    if n == -1:
        raise ValueError("FASTQ name line must start with '@'")
    if n == -2:
        raise ValueError(f"read length exceeds max_read_len {max_len}")
    names = [buf[name_off[i]:name_off[i] + name_len[i]] for i in range(n)]
    quals = [buf[qual_off[i]:qual_off[i] + qual_len[i]] for i in range(n)]
    pluses = [buf[plus_off[i]:plus_off[i] + plus_len[i]] for i in range(n)]
    return bases[:n], lengths[:n], names, quals, pluses, consumed.value
