from .normalize import explode_pushes_batch, normalize_articles_batch

__all__ = ["explode_pushes_batch", "normalize_articles_batch"]
