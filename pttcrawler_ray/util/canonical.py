"""URL canonicalization for the frontier seen-set.

Canonical form (standard crawl-frontier normalization; RFC 3986 §6):
lowercase scheme and host, default ports stripped, fragment dropped,
dot-segments resolved, empty path → ``/``, query preserved verbatim.
The seen-set key is ``hash_u64(canonicalize_url(url))`` (SURVEY.md §1.2 T2).
"""

from __future__ import annotations

import posixpath
from urllib.parse import urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def canonicalize_url(url: str) -> str:
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"

    path = parts.path or "/"
    # resolve dot-segments, preserving a trailing slash
    if "." in path:
        trailing = path.endswith("/")
        path = posixpath.normpath(path)
        if trailing and not path.endswith("/"):
            path += "/"
    if not path.startswith("/"):
        path = "/" + path

    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of(url: str) -> str:
    """Lowercased hostname — the frontier partitioning key (politeness unit)."""
    return (urlsplit(url).hostname or "").lower()
