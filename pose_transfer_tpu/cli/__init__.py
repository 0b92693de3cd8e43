from .opts import Opts  # noqa: F401
