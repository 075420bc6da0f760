"""First-party native (C++) host components.

The compute path is JAX/XLA/Pallas; the host runtime around it uses C++
where the reference leaned on native dependencies (SURVEY §2c). Modules
here load shared libraries built from ``csrc/`` with ctypes and degrade
gracefully to the pure-Python fallbacks when no compiler/library is
available.
"""

from audiocodecs_tpu.native.wavio import (  # noqa: F401
    native_wavio_available,
    read_wav_native,
    write_wav_native,
)
