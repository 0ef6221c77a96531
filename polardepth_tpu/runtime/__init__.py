"""Native (C++) ingest runtime: threaded libpng decoding behind ctypes.

The reference has no native code at all (SURVEY §2 intro: pure Python on
torch DataLoader workers); here the host's only real job — PNG decode into
batch buffers — runs GIL-free in a C++ thread pool.  Python falls back to
cv2 transparently when the shared library hasn't been built.
"""

from polardepth_tpu.runtime.native import (
    NativePngDecoder, build as build_native, available as native_available,
)
