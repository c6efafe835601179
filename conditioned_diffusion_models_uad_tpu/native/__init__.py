"""Native (C++) runtime components: NIfTI IO + threaded prefetch loading."""
from .binding import (
    NativeUnavailable,
    native_available,
    read_nifti_native,
    write_nifti_native,
    PrefetchLoader,
)

__all__ = [
    "NativeUnavailable",
    "PrefetchLoader",
    "native_available",
    "read_nifti_native",
    "write_nifti_native",
]
