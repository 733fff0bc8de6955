from . import pnp, sim3, two_view  # noqa: F401
