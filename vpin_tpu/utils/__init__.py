from .timer import Timer, span
from .config import VpinConfig, DEFAULT_CONFIG
from . import bincode

__all__ = ["Timer", "span", "VpinConfig", "DEFAULT_CONFIG", "bincode"]
