from .batcher import BatcherStats, ContinuousBatcher

__all__ = ["BatcherStats", "ContinuousBatcher"]
