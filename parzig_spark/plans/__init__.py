from .manifest import ManifestStore  # noqa: F401
