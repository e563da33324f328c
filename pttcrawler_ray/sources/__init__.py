from .pages import FetchPages, PagesStore

__all__ = ["FetchPages", "PagesStore"]
