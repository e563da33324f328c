"""Live-HTTP fetch adapter (the reference's real network path, S1/S2).

The engine's default fetch is the parquet ``pages`` snapshot lookup
(:class:`..sources.pages.FetchPages` — the sandbox has no network and the
brief's input table is Common-Crawl-shaped).  A REAL deployment fetches
over HTTP the way the reference does: ``requests.get(url, headers=UA,
cookies=..., timeout=...)`` with the response cookies carried to the next
request and ``over18=1`` forced after every response (reference
``crawler/article.py:267-276`` for the article GET + non-200 → error-row
semantics, ``:272-273`` for the cookie carry, ``:426-436`` for the index
GET, ``config_example.ini:16`` ``Timeout = 10``).

:class:`FetchHttp` is that adapter with the SAME batch contract as
``FetchPages`` — input ``pa.Table`` with a ``url`` column, output = input
columns + ``(warc_ts, html, text, lang, fetch_ok)`` — so it drops into
the crawl engine (``CrawlConfig(fetch='http', http={...})``) with no other
change: frontier, politeness, ordering, parsing, sinks are all identical.

Scale/design notes:

- The per-url loop here is intentional: a live fetch is one network
  round-trip per url, inherently row-at-a-time I/O (unlike the snapshot
  lookup, which vectorizes).  Throughput comes from the actor pool
  (``fetch_concurrency``) and the politeness budget, not from batch SIMD.
- Cookie state is PER ACTOR, like the reference's per-crawler session.
- Retries cover transport errors only (timeout / connection reset), with
  a bounded attempt count; an HTTP status != 200 is NOT retried — the
  reference turns it into the ``{"error": "invalid url"}`` record
  immediately (``crawler/article.py:273-275``).
- ``warc_ts`` (the snapshot timestamp the versioned sink keys on) comes
  from the response's ``X-Warc-Ts`` (ISO, exact) or ``Memento-Datetime``
  (RFC 1123 — what real archive replay servers send) header when present,
  else the fetch wall time: a live crawl IS the snapshot.
- ``rewrite`` maps url prefixes (longest match wins) before the GET —
  the mirror/replay-proxy knob, and how tests point ``https://www.ptt.cc``
  at an in-process stub server without touching frontier urls.
- The per-host robots gate matches ``FetchPages``: ``/robots.txt`` is
  fetched ONCE per (host, actor) over the same transport and parsed with
  stdlib ``urllib.robotparser``; disallowed urls become fetch misses.
"""

from __future__ import annotations

import time
from email.utils import parsedate_to_datetime

import numpy as np
import pyarrow as pa

# the reference sends a desktop-browser UA (crawler/article.py:42-44)
DEFAULT_HEADERS = {"User-Agent": "pttcrawler-ray/1.0"}


class _Resp:
    """requests.Response-shaped result: status_code/content/headers/cookies."""

    __slots__ = ("status_code", "content", "headers", "cookies")

    def __init__(self, status_code: int, content: bytes, headers: dict,
                 cookies: dict):
        self.status_code = status_code
        self.content = content
        self.headers = headers
        self.cookies = cookies


class UrllibSession:
    """Stdlib session with a ``requests.Session``-shaped ``get``.

    ``requests`` is not a hard dependency of the engine; this covers the
    same surface FetchHttp needs (headers + cookie jar in, status/body/
    headers/set-cookies out).  Swap in a real ``requests.Session`` via
    ``FetchHttp(session_factory=requests.Session)`` — the call signature
    is compatible.
    """

    def get(self, url: str, headers: dict | None = None,
            cookies: dict | None = None, timeout: float = 10.0) -> _Resp:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=dict(headers or {}))
        if cookies:
            req.add_header("Cookie",
                           "; ".join(f"{k}={v}" for k, v in cookies.items()))
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                body, status, hdrs = r.read(), r.status, dict(r.headers.items())
        except urllib.error.HTTPError as e:
            # a served non-2xx page (404/500/...) is a RESPONSE, not a
            # transport failure — FetchHttp decides retry vs error-row
            body, status, hdrs = e.read(), e.code, dict(e.headers.items())
        cookies_out = {}
        for sc in [v for k, v in hdrs.items() if k.lower() == "set-cookie"]:
            first = sc.split(";", 1)[0]
            if "=" in first:
                k, v = first.split("=", 1)
                cookies_out[k.strip()] = v.strip()
        return _Resp(status, body, hdrs, cookies_out)


def _parse_warc_ts(headers: dict) -> "np.datetime64 | None":
    """Snapshot timestamp from replay headers (None = live fetch)."""
    for k, v in headers.items():
        if k.lower() == "x-warc-ts":  # ISO 8601, microsecond-exact
            try:
                return np.datetime64(v, "us")
            except ValueError:
                pass
    for k, v in headers.items():
        if k.lower() == "memento-datetime":  # RFC 1123 (archive replay)
            try:
                dt = parsedate_to_datetime(v)
                return np.datetime64(dt.replace(tzinfo=None), "us")
            except (TypeError, ValueError):
                pass
    return None


class FetchHttp:
    """map_batches actor: frontier rows in → live-fetched page rows out.

    Same contract as :class:`..sources.pages.FetchPages`; see the module
    docstring for the reference semantics each knob mirrors.

    Args:
        headers: base request headers (default a UA, reference
            ``crawler/article.py:42-44``).
        timeout: per-request seconds (reference ``config_example.ini:16``).
        retries: max TRANSPORT-error attempts per url (>=1).  Status
            != 200 is never retried (reference error-row semantics).
        retry_backoff_s: sleep between transport retries (0 in tests).
        rewrite: ``{url_prefix: replacement}`` applied longest-match-first
            before the GET (mirror / replay proxy / test stub routing).
        session_factory: zero-arg callable returning a session with a
            ``get(url, headers=, cookies=, timeout=)`` method (default
            :class:`UrllibSession`; pass ``requests.Session`` when
            available).  Must be picklable (module-level) — it ships to
            the fetch actors.
        respect_robots: per-host robots.txt gate like FetchPages (the
            engine-wide T1 behavior; the reference itself has no robots
            handling, documented deviation).
    """

    def __init__(self, headers: dict | None = None, timeout: float = 10.0,
                 retries: int = 3, retry_backoff_s: float = 0.5,
                 rewrite: dict | None = None, session_factory=None,
                 respect_robots: bool = True):
        self.headers = dict(headers) if headers else dict(DEFAULT_HEADERS)
        self.timeout = float(timeout)
        self.retries = max(1, int(retries))
        self.retry_backoff_s = float(retry_backoff_s)
        self.rewrite = sorted((rewrite or {}).items(),
                              key=lambda kv: -len(kv[0]))
        self.session = (session_factory or UrllibSession)()
        # reference cookie carry: self.cookies = resp.cookies, then
        # over18=1 forced (crawler/article.py:272-273)
        self.cookies: dict[str, str] = {"over18": "1"}
        self.respect_robots = respect_robots
        self._host_gate: dict[str, object] = {}

    # ------------------------------------------------------------ transport
    def _rewrite(self, url: str) -> str:
        for prefix, repl in self.rewrite:
            if url.startswith(prefix):
                return repl + url[len(prefix):]
        return url

    def _get(self, url: str) -> "_Resp | None":
        """One url through rewrite + retry loop; None = transport failure
        after all attempts (the caller's miss row)."""
        target = self._rewrite(url)
        for attempt in range(self.retries):
            try:
                resp = self.session.get(target, headers=self.headers,
                                        cookies=self.cookies,
                                        timeout=self.timeout)
            except Exception:  # timeout / connection error: bounded retry
                if attempt + 1 < self.retries and self.retry_backoff_s:
                    time.sleep(self.retry_backoff_s)
                continue
            # reference crawler/article.py:272-273 — replace the jar with
            # the response cookies, then force over18=1
            self.cookies = dict(resp.cookies)
            self.cookies["over18"] = "1"
            return resp
        return None

    # ------------------------------------------------------------ robots
    def _gate_rules(self, host: str):
        if host in self._host_gate:
            return self._host_gate[host]
        rules = None
        if host:
            resp = self._get(f"https://{host}/robots.txt")
            if resp is not None and resp.status_code == 200:
                from urllib.robotparser import RobotFileParser

                rules = RobotFileParser()
                rules.parse(resp.content.decode("utf-8",
                                                errors="replace").splitlines())
        self._host_gate[host] = rules
        return rules

    # ------------------------------------------------------------ batch
    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        n = len(urls)
        warc_ts = np.full(n, np.datetime64("NaT"), dtype="datetime64[us]")
        html: list[bytes | None] = [None] * n
        ok = np.zeros(n, dtype=bool)

        for i, url in enumerate(urls):
            if self.respect_robots:
                host = url.split("/", 3)[2] if "//" in url else ""
                rules = self._gate_rules(host)
                if rules is not None and not rules.can_fetch("*", url):
                    continue  # gate-blocked reads as a 404 (FetchPages parity)
            resp = self._get(url)
            if resp is None or resp.status_code != 200:
                continue  # transport failure / non-200 → error row
            ts = _parse_warc_ts(resp.headers)
            warc_ts[i] = (ts if ts is not None
                          else np.datetime64(int(time.time() * 1e6), "us"))
            html[i] = resp.content
            ok[i] = True

        if "warc_ts" in batch.column_names:
            batch = batch.drop_columns(["warc_ts"])
        out = batch.append_column(
            "warc_ts", pa.array(warc_ts, pa.timestamp("us"),
                                mask=~ok))
        out = out.append_column("html", pa.array(html, pa.binary()))
        # live fetches have no pre-extracted text / language columns; the
        # parser works from html (crawl never reads these downstream)
        out = out.append_column("text", pa.nulls(n, pa.string()))
        out = out.append_column("lang", pa.nulls(n, pa.string()))
        return out.append_column("fetch_ok", pa.array(ok))
