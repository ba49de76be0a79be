from . import se2, se3  # noqa: F401
