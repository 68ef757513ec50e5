"""Native host runtime: C++ decoders + prefetch, via ctypes."""

from gvl_tpu.runtime.native import (
    NativePrefetchSource,
    NativeY4MReader,
    native_available,
    read_wav_native,
)

__all__ = [
    "native_available",
    "NativeY4MReader",
    "NativePrefetchSource",
    "read_wav_native",
]
