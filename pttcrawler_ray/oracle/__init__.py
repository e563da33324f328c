from .refparse import PostException, ref_get_last_page, ref_parse_article, ref_parse_index

__all__ = ["PostException", "ref_parse_article", "ref_parse_index", "ref_get_last_page"]
