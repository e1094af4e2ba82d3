from .compile_cache import enable_compile_cache
from .logging import log

__all__ = ["enable_compile_cache", "log"]
