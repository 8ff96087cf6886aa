"""Native (C++) data-plane bindings via ctypes.

Builds ``libsvit_native.so`` on first import when a toolchain is present;
every consumer degrades gracefully to the pure-Python path when it isn't.
"""

from svit_tpu.native import jpeg  # noqa: F401
