from . import formats, numerics, ste  # noqa: F401
