from . import nrt  # noqa: F401
