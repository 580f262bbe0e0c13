from .sweep import BatchedSweep

__all__ = ["BatchedSweep"]
