from .article import parse_article_html, parse_articles_batch
from .index import extract_index_links, get_last_page, parse_index_batch
from .scalars import parse_author, parse_push_ipdatetime

__all__ = [
    "parse_article_html",
    "parse_articles_batch",
    "extract_index_links",
    "parse_index_batch",
    "get_last_page",
    "parse_author",
    "parse_push_ipdatetime",
]
