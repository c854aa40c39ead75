from . import b85, lcb, coords  # noqa: F401
