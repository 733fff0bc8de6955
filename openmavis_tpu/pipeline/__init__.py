from . import loop_closing, multi_tracking, system, tracking  # noqa: F401
