from . import evaluation  # noqa: F401
