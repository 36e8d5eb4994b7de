"""Library-specific exception types (SURVEY.md §2a row 9)."""


class DecompError(ValueError):
    """Base class for decomp_tpu input/usage errors."""


class ShapeError(DecompError):
    """Raised when input array shapes are inconsistent."""


class DtypeError(DecompError):
    """Raised when input array dtypes are inconsistent or unsupported."""
