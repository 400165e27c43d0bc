from .constants import SAParams, DEFAULTS  # noqa: F401
from . import codes  # noqa: F401
