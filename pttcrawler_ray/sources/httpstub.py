"""In-process HTTP replay server over a corpus ``pages`` table.

Test/demo transport for :class:`.http.FetchHttp` (the sandbox has no
network): serves every host of a snapshot corpus from one local port
under ``/h/<host>/<path>``, so a single rewrite rule points the whole
web at it::

    srv = CorpusHttpServer.from_corpus_dir(corpus_dir); srv.start()
    FetchHttp(rewrite={"https://": f"http://127.0.0.1:{srv.port}/h/"})

Replay semantics match the engine's snapshot fetch: the NEWEST
``warc_ts`` snapshot per url is served, with the snapshot time sent as
both ``X-Warc-Ts`` (ISO, microsecond-exact) and ``Memento-Datetime``
(RFC 1123, the public web-archive replay convention) so ``FetchHttp``
reconstructs the exact ``warc_ts`` the parquet lookup would produce.
Unknown urls 404.

Test hooks:

- every response sets a session cookie and every received ``Cookie``
  header is recorded (``requests_seen``) — asserts the reference's
  cookie-carry + ``over18=1`` behavior (crawler/article.py:272-273);
- ``fail_first(url, n)`` makes the next ``n`` requests for that url die
  mid-transport (connection closed before any status line) — exercises
  ``FetchHttp``'s bounded retry;
- ``status_override[url]`` serves a fixed non-200 status (no retry path).
"""

from __future__ import annotations

import glob
import os
import threading
from email.utils import formatdate
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def newest_snapshots(pages: pa.Table) -> dict[str, tuple[int, bytes]]:
    """url → (warc_ts_us, html_bytes) of the newest snapshot per url."""
    urls = pages["url"].to_pylist()
    ts = (pages["warc_ts"].to_numpy(zero_copy_only=False)
          .astype("datetime64[us]").astype(np.int64))
    html = pages["html"].to_pylist()
    out: dict[str, tuple[int, bytes]] = {}
    for u, t, b in zip(urls, ts, html):
        if b is None:
            continue
        prev = out.get(u)
        if prev is None or t >= prev[0]:
            out[u] = (int(t), bytes(b))
    return out


class CorpusHttpServer:
    """Threaded local HTTP server replaying a url→snapshot dict."""

    def __init__(self, snapshots: dict[str, tuple[int, bytes]],
                 host: str = "127.0.0.1", port: int = 0):
        self.snapshots = snapshots
        self.requests_seen: list[tuple[str, str]] = []  # (url, cookie header)
        self._fail_first: dict[str, int] = {}
        self.status_override: dict[str, int] = {}
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                # /h/<host>/<path> → original https url
                if not self.path.startswith("/h/"):
                    self.send_error(404)
                    return
                hostname, _, rest = self.path[3:].partition("/")
                url = f"https://{hostname}/{rest}"
                with outer._lock:
                    outer.requests_seen.append(
                        (url, self.headers.get("Cookie", "")))
                    left = outer._fail_first.get(url, 0)
                    if left > 0:
                        outer._fail_first[url] = left - 1
                        # die mid-transport: no status line, connection reset
                        self.close_connection = True
                        self.connection.close()
                        return
                status = outer.status_override.get(url)
                if status is not None:
                    self.send_response(status)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                snap = outer.snapshots.get(url)
                if snap is None:
                    self.send_error(404)
                    return
                ts_us, body = snap
                self.send_response(200)
                iso = str(np.datetime64(ts_us, "us"))
                self.send_header("X-Warc-Ts", iso)
                self.send_header("Memento-Datetime",
                                 formatdate(ts_us / 1e6, usegmt=True))
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Set-Cookie", "stubsess=1; Path=/")
                self.end_headers()
                self.wfile.write(body)

        class _QuietServer(ThreadingHTTPServer):
            def handle_error(self, request, client_address):
                pass  # injected transport faults are expected noise

        self._httpd = _QuietServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self._thread: threading.Thread | None = None

    @classmethod
    def from_corpus_dir(cls, corpus_dir: str, **kw) -> "CorpusHttpServer":
        files = sorted(glob.glob(
            os.path.join(corpus_dir, "pages", "bucket=*", "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no pages buckets under {corpus_dir}")
        pages = pa.concat_tables([pq.read_table(f) for f in files])
        return cls(newest_snapshots(pages), **kw)

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def rewrite(self) -> dict:
        """The FetchHttp rewrite rule pointing all https urls here."""
        return {"https://": f"http://127.0.0.1:{self.port}/h/"}

    def fail_first(self, url: str, n: int) -> None:
        with self._lock:
            self._fail_first[url] = n

    def start(self) -> "CorpusHttpServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
