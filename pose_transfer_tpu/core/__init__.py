from . import pose, skeletons, transforms_host  # noqa: F401
