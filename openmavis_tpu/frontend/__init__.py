from . import extractor, fast, matcher, orb, pyramid  # noqa: F401
