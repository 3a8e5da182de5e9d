"""Teaching example: zero-overhead Python↔native callbacks via ctypes.

The ``cfunc_example`` analog: the reference passes a numba ``cfunc``
through ``scipy.LowLevelCallable`` into a pybind11 consumer
(cfunc_example/example.py:19-40) — the pattern for calling Python-defined
logic from a native hot loop without the interpreter. Neither numba nor
pybind11 is in this image, so the same idea is shown with the tools that
are: a C-ABI consumer in the framework's native library driven through
``ctypes.CFUNCTYPE``, plus the reverse direction (Python driving a native
hot function), which is how the stream layer actually uses native code.

Run: ``python examples/ctypes_callback.py``
"""

import ctypes

import numpy as np

from dpdk_dc_sand_tpu.native import load_native


def native_hot_path() -> None:
    """Python → native: the framework's production direction."""
    lib = load_native()
    if lib is None:
        print("native toolchain unavailable; skipping")
        return
    words = np.empty(1 << 16, np.uint64)
    lib.sp_fill_pattern(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        words.size,
        7,
        0,
    )
    bad = lib.sp_check_pattern(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), words.size, 7
    )
    print(f"native pattern fill+check over {words.size} words: {bad} mismatches")


def python_callback_from_native() -> None:
    """Native → Python: a C-ABI callback pointer built with CFUNCTYPE.

    The consumer here is libc's qsort — any native API taking a function
    pointer works identically (scipy.LowLevelCallable's role in the
    reference example).
    """
    libc = ctypes.CDLL("libc.so.6")
    arr = (ctypes.c_int * 8)(5, 3, 8, 1, 9, 2, 7, 4)

    calls = {"n": 0}

    @ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int))
    def compare(a, b):
        calls["n"] += 1
        return a[0] - b[0]

    libc.qsort(arr, len(arr), ctypes.sizeof(ctypes.c_int), compare)
    print(f"qsort via python callback: {list(arr)} ({calls['n']} comparisons)")
    assert list(arr) == sorted(arr)


if __name__ == "__main__":
    native_hot_path()
    python_callback_from_native()
