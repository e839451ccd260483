"""Native (C++) runtime components, loaded via ctypes.

Currently: the multithreaded point-cloud text parser (txt_loader.cpp).
The shared library is built lazily with g++ on first use and cached next to
the source; any failure falls back to the pure-Python path in
piccolo_tpu.data.loader.
"""

from . import txt_loader  # noqa: F401

__all__ = ["txt_loader"]
