from .asof import asof_latest  # noqa: F401
from .sessionize import sessionize  # noqa: F401
