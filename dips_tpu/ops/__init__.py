from . import networks, oracle, reference  # noqa: F401
