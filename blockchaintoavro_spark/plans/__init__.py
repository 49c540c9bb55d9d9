from .registry import REGISTRY, DeclaredQuery, declare, load_all  # noqa: F401
