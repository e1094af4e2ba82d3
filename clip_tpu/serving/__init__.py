from .batcher import BatcherStats, ContinuousBatcher
from .multihost import MultiHostBatcher

__all__ = ["BatcherStats", "ContinuousBatcher", "MultiHostBatcher"]
