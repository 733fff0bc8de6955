from . import map_state  # noqa: F401
