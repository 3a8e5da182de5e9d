"""Build-on-first-use for the native components.

Compiles ``native/*.cpp`` into one shared library with g++ (no external
build deps — make/cmake stay out of the import path), caches the result
next to the sources, and rebuilds when any source is newer than the
library. Returns ``None`` when no toolchain is available so callers can
fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).resolve().parent
_SOURCES = ["ringbuffer.cpp", "spead_codec.cpp", "membw.cpp", "udp_burst.cpp", "xdp_burst.cpp"]
_LIB = _DIR / "_dcsand_native.so"
_LOCK = threading.Lock()
_CACHED: Optional[ctypes.CDLL] = None
_TRIED = False


def _needs_build() -> bool:
    if not _LIB.exists():
        return True
    lib_mtime = _LIB.stat().st_mtime
    return any((_DIR / s).stat().st_mtime > lib_mtime for s in _SOURCES)


def _build() -> bool:
    gxx = shutil.which("g++")
    if gxx is None:
        return False
    cmd = [
        gxx,
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        *[str(_DIR / s) for s in _SOURCES],
        "-o",
        str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """The shared library, building it if necessary; None if unavailable."""
    global _CACHED, _TRIED
    with _LOCK:
        if _CACHED is not None or (_TRIED and not _needs_build()):
            return _CACHED
        _TRIED = True
        if _needs_build() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        _declare(lib)
        _CACHED = lib
        return lib


def _declare(lib: ctypes.CDLL) -> None:
    u64, u32, u16 = ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint16
    p8 = ctypes.POINTER(ctypes.c_uint8)
    vp = ctypes.c_void_p

    lib.rb_create.restype = vp
    lib.rb_create.argtypes = [u64, u64]
    lib.rb_destroy.argtypes = [vp]
    lib.rb_slot_bytes.restype = u64
    lib.rb_slot_bytes.argtypes = [vp]
    lib.rb_capacity.restype = u64
    lib.rb_capacity.argtypes = [vp]
    lib.rb_acquire_write.restype = p8
    lib.rb_acquire_write.argtypes = [vp]
    lib.rb_commit_write.argtypes = [vp, u64, u64]
    lib.rb_count_drop.argtypes = [vp]
    lib.rb_acquire_read.restype = p8
    lib.rb_acquire_read.argtypes = [vp, ctypes.POINTER(u64), ctypes.POINTER(u64)]
    lib.rb_release_read.argtypes = [vp]
    lib.rb_size.restype = u64
    lib.rb_size.argtypes = [vp]
    lib.rb_stats.argtypes = [vp] + [ctypes.POINTER(u64)] * 3
    lib.rb_count_consumed.argtypes = [vp]

    lib.sp_header_bytes.restype = u64
    lib.sp64_header_bytes.restype = u64
    lib.sp64_packetize.restype = u64
    lib.sp64_packetize.argtypes = [
        p8, u64, u64, u64, ctypes.c_uint32, u64, p8, u64,
    ]
    lib.sp_packetize.restype = u64
    lib.sp_packetize.argtypes = [p8, u64, u64, u64, u32, u64, p8, u64]
    lib.sp_parse_header.restype = ctypes.c_int
    lib.sp_parse_header.argtypes = [
        p8,
        u64,
        ctypes.POINTER(u64),
        ctypes.POINTER(u64),
        ctypes.POINTER(u32),
        ctypes.POINTER(u16),
        ctypes.POINTER(u16),
        ctypes.POINTER(u32),
        ctypes.POINTER(u32),
    ]
    lib.sp_scatter.restype = ctypes.c_longlong
    lib.sp_scatter.argtypes = [p8, u64, u64, p8, u64]
    lib.sp_fill_pattern.argtypes = [ctypes.POINTER(u64), u64, u64, u64]
    lib.sp_check_pattern.restype = u64
    lib.sp_check_pattern.argtypes = [ctypes.POINTER(u64), u64, u64]

    lib.membw_scan.restype = ctypes.c_double
    lib.membw_scan.argtypes = [u32, u64, ctypes.c_double, u32]

    cs = ctypes.c_char_p
    lib.ub_sender_create.restype = vp
    lib.ub_sender_create.argtypes = [cs, u16, u64]
    lib.ub_sender_create_mode.restype = vp
    lib.ub_sender_create_mode.argtypes = [cs, u16, u64, ctypes.c_int]
    lib.ub_sender_mode.restype = ctypes.c_int
    lib.ub_sender_mode.argtypes = [vp]
    lib.ub_receiver_create_mode.restype = vp
    lib.ub_receiver_create_mode.argtypes = [cs, u16, cs, u64, vp, ctypes.c_int]
    lib.ub_receiver_mode.restype = ctypes.c_int
    lib.ub_receiver_mode.argtypes = [vp]
    lib.ub_send_chunk.restype = ctypes.c_longlong
    lib.ub_send_chunk.argtypes = [vp, p8, u64, u64, u64, u32]
    lib.ub_sender_stats.argtypes = [vp, ctypes.POINTER(u64), ctypes.POINTER(u64)]
    lib.ub_sender_destroy.argtypes = [vp]
    lib.ub_receiver_create.restype = vp
    lib.ub_receiver_create.argtypes = [cs, u16, cs, u64, vp]
    lib.ub_receiver_port.restype = u16
    lib.ub_receiver_port.argtypes = [vp]
    lib.ub_receiver_stats.argtypes = [vp] + [ctypes.POINTER(u64)] * 5
    lib.ub_receiver_destroy.argtypes = [vp]

    # AF_XDP engine (xdp_burst.cpp)
    lib.xsk_sender_create.restype = vp
    lib.xsk_sender_create.argtypes = [cs, cs, cs, u16, u16, u64]
    lib.xsk_sender_create_fmt.restype = vp
    lib.xsk_sender_create_fmt.argtypes = [cs, cs, cs, u16, u16, u64, ctypes.c_int]
    lib.xsk_send_chunk.restype = ctypes.c_longlong
    lib.xsk_send_chunk.argtypes = [vp, p8, u64, u64, u64, u32]
    lib.xsk_sender_stats.argtypes = [vp, ctypes.POINTER(u64), ctypes.POINTER(u64)]
    lib.xsk_sender_destroy.argtypes = [vp]
    lib.xsk_receiver_create.restype = vp
    lib.xsk_receiver_create.argtypes = [cs, u16, u64, vp]
    lib.xsk_receiver_create_multi.restype = vp
    lib.xsk_receiver_create_multi.argtypes = [
        cs, ctypes.POINTER(u16), ctypes.c_int, u64, vp,
    ]
    lib.xsk_receiver_stats.argtypes = [vp] + [ctypes.POINTER(u64)] * 5
    lib.xsk_receiver_destroy.argtypes = [vp]
