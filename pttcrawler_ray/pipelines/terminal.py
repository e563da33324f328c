"""Interactive terminal user-crawl session (SURVEY.md S7, driver half).

The reference drives a browser terminal against term.ptt.cc
(``crawler/user.py:25-95`` transport, ``:211-296`` session loop); the
sandbox has neither a browser nor a network, so the TRANSPORT is
injected (anything with ``connect`` / ``send_keys`` / ``get_buffer``)
and the SESSION SEMANTICS are reproduced faithfully:

- login (``crawler/user.py:211-221``): connect, send userid, send
  password, then keep sending empty keys until the main menu marker
  (``主功能表``) appears in the buffer — the reference's
  kick-duplicate-login / clear-failed-attempts loop;
- query loop (``:240-296``): enter the Talk menu (``T``), then per
  user: ``Q`` → user id → read buffer → parse (the M6 regex via
  :func:`..users.extract_users_batch`) → empty key to dismiss; a
  non-matching buffer logs an error row and the id still leaves the
  queue (``:275-281``);
- disconnect recovery (``:285-293``): ``send_keys`` raising
  :class:`PttDisconnectException` bumps an error counter — the THIRD
  error re-raises; otherwise dismiss, re-login, re-enter Talk, and
  ``continue`` — the interrupted user stays in the queue and is
  retried on the next pass of the outer while loop, exactly the
  reference's queue discipline;
- records flush every ``flush_every`` (reference: 100,
  ``:271-274``) plus a final flush.

:class:`FakeTermServer` is the in-process conformance transport (the
same pattern as the HTTP-stub fetch source): it serves the synthetic
``user_screens`` buffers through a real screen state machine (login
interstitials, menu, query prompt) and can inject scripted disconnects.
"""

from __future__ import annotations

import pyarrow as pa

_MAIN_MENU = "主功能表"


class PttDisconnectException(Exception):
    """The transport observed the '你斷線了' alert (crawler/user.py:89-95)."""


class TerminalUserSession:
    """The reference session loop over an injected transport."""

    def __init__(self, transport, userid: str = "", userpwd: str = "",
                 url: str = "http://term.ptt.cc/"):
        self._t = transport
        self._userid = userid
        self._userpwd = userpwd
        self._url = url

    def login(self) -> None:
        """crawler/user.py:211-221 — connect, credentials, dismiss
        interstitials until the main menu shows."""
        self._t.connect(self._url)
        self._t.send_keys(self._userid)
        self._t.send_keys(self._userpwd)
        while _MAIN_MENU not in self._t.get_buffer():
            self._t.send_keys("")

    def crawl_users(self, id_list: "list[str]", flush_every: int = 100,
                    on_flush=None) -> pa.Table:
        """crawler/user.py:224-296 — query each user's info screen;
        returns the parsed user table (M6 semantics, typed error rows
        for non-matching buffers)."""
        from .users import extract_users_batch

        self.login()
        self._t.send_keys("T")  # Talk menu (reference :241)

        names: "list[str]" = []
        buffers: "list[str]" = []
        id_queue = list(id_list)
        err_count = 0
        pending = 0
        while id_queue:
            for user_id in list(id_list):
                if user_id not in id_queue:
                    continue
                try:
                    self._t.send_keys("Q")
                    self._t.send_keys(user_id)
                    buf = self._t.get_buffer()
                    names.append(user_id)
                    buffers.append(buf)
                    pending += 1
                    if on_flush is not None and pending >= flush_every:
                        on_flush(names[-pending:], buffers[-pending:])
                        pending = 0
                    self._t.send_keys("")
                    id_queue.remove(user_id)
                except PttDisconnectException:
                    err_count += 1
                    if err_count == 3:  # reference :287-288: third error fatal
                        raise
                    self._t.send_keys("")
                    self.login()
                    self._t.send_keys("T")
                    continue
        if on_flush is not None and pending:
            on_flush(names[-pending:], buffers[-pending:])
        return extract_users_batch(pa.table({
            "username": pa.array(names, pa.string()),
            "text": pa.array(buffers, pa.string()),
        }))


class FakeTermServer:
    """In-process terminal conformance stub: a screen state machine
    serving ``user_screens`` buffers, with scripted disconnect and
    login-interstitial injection."""

    def __init__(self, screens: "dict[str, str]",
                 interstitials: int = 0,
                 disconnect_on_send: "set[int] | None" = None):
        self._screens = screens
        self._interstitials = interstitials
        self._disconnects = disconnect_on_send or set()
        self._sends = 0
        self._state = "offline"
        self._buffer = ""
        self._pending_dismiss = 0
        self.log: "list[tuple[str, str]]" = []

    def connect(self, url: str) -> None:
        self.log.append(("connect", url))
        self._state = "login_id"
        self._buffer = "請輸入代號"

    def send_keys(self, buffer: str) -> "FakeTermServer":
        self._sends += 1
        self.log.append(("send", buffer))
        if self._sends in self._disconnects:
            self._state = "offline"
            raise PttDisconnectException()
        if self._state == "offline":
            # the dismissal keypress clears the alert (term.ptt.cc's web
            # client reconnects on input); a fresh connect() must follow
            self._state = "dismissed"
            self._buffer = ""
            return self
        if self._state == "login_id":
            self._state = "login_pw"
        elif self._state == "login_pw":
            self._pending_dismiss = self._interstitials
            self._state = "interstitial" if self._interstitials else "menu"
            self._buffer = ("重複登入" if self._interstitials
                            else f"{_MAIN_MENU}\n(T)alk")
        elif self._state == "interstitial":
            self._pending_dismiss -= 1
            if self._pending_dismiss <= 0:
                self._state = "menu"
                self._buffer = f"{_MAIN_MENU}\n(T)alk"
        elif self._state == "menu" and buffer == "T":
            self._state = "talk"
            self._buffer = "(Q)uery"
        elif self._state == "talk" and buffer == "Q":
            self._state = "query"
            self._buffer = "請輸入使用者代號"
        elif self._state == "query":
            self._buffer = self._screens.get(
                buffer, f"查無此人: {buffer}")
            self._state = "result"
        elif self._state == "result":
            self._state = "talk"
            self._buffer = "(Q)uery"
        return self

    def get_buffer(self) -> str:
        return self._buffer
