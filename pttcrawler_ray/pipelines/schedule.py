"""Cron scheduling for recurring crawl/export runs (reference ``schedule.py``).

The reference manages user crontab entries via python-crontab
(``schedule.py:68-111``): per (module, args) it UPSERTS one job firing at
``start_datetime``'s minute/hour on every ``cycle_time``-th day of month
(``job.minute.on(m); job.hour.on(h); job.dom.every(n)``), or removes it.
python-crontab is not in this environment, so this module builds and edits
crontab TEXT directly with the same semantics; the actual install shells
out to the ``crontab`` binary when present (a real deployment would more
likely ``ray job submit`` per run — this covers the reference's CLI
surface).

All the logic is pure text functions (unit-testable without cron);
:func:`apply_schedule` is the thin side-effecting wrapper.
"""

from __future__ import annotations

import shutil
import subprocess
from datetime import datetime

_MARKER = "# pttcrawler_ray:"


def cron_line(command: str, start: datetime, cycle_days: int, tag: str) -> str:
    """One crontab entry, reference field semantics: fire at start's
    minute/hour every ``cycle_days`` days-of-month (dom.every(n) → */n)."""
    dom = "*" if cycle_days <= 1 else f"*/{int(cycle_days)}"
    # crontab(5): an unescaped % splits the command and feeds the rest to
    # stdin — escape it in both the command and the tag comment
    cmd = command.replace("%", r"\%")
    esc_tag = tag.replace("%", r"\%")
    return (f"{start.minute} {start.hour} {dom} * * "
            f"{cmd} >/dev/null 2>&1 {_MARKER}{esc_tag}")


def upsert_job(crontab_text: str, tag: str, new_line: str) -> str:
    """Replace the job tagged ``tag`` (or append it) — the reference's
    find-command + set_command-or-new upsert (schedule.py:77-96)."""
    lines = crontab_text.splitlines()
    needle = _MARKER + tag.replace("%", r"\%")  # matches cron_line's escaping
    out, replaced = [], False
    for ln in lines:
        if ln.rstrip().endswith(needle):
            if not replaced:
                out.append(new_line)
                replaced = True
            # duplicate tagged lines collapse into the one fresh entry
        else:
            out.append(ln)
    if not replaced:
        out.append(new_line)
    return "\n".join(out).strip("\n") + "\n"


def remove_job(crontab_text: str, tag: str) -> str:
    """Drop the job tagged ``tag`` (reference ScheduleAction.remove)."""
    needle = _MARKER + tag.replace("%", r"\%")
    out = [ln for ln in crontab_text.splitlines()
           if not ln.rstrip().endswith(needle)]
    text = "\n".join(out).strip("\n")
    return text + "\n" if text else ""


def module_command(module: str, args: str, python: str | None = None) -> str:
    """The command a job runs: the engine CLI subcommand (the reference
    wraps ``python -m crawler <module> <args>`` in env_wrapper.sh for the
    same reason we default to the absolute interpreter path: cron's
    minimal PATH may lack the venv's ``python``)."""
    if python is None:
        import sys

        python = sys.executable or "python3"
    return f"{python} -m pttcrawler_ray {module} {args}".rstrip()


def apply_schedule(action: str, module: str, args: str, start: datetime | None = None,
                   cycle_days: int = 1, _run=None) -> str:
    """Upsert/remove the cron entry for (module, args); returns the new
    crontab text.  ``_run`` injects the crontab transport for tests; the
    default requires the ``crontab`` binary."""
    tag = f"{module} {args}".strip()
    if _run is None:
        if shutil.which("crontab") is None:
            raise RuntimeError("no crontab binary on this host; use "
                               "`ray job submit` for recurring runs instead")

        def _run(new_text=None):
            if new_text is None:
                res = subprocess.run(["crontab", "-l"], capture_output=True, text=True)
                return res.stdout if res.returncode == 0 else ""
            subprocess.run(["crontab", "-"], input=new_text, text=True, check=True)
            return new_text

    current = _run()
    if action == "update":
        if start is None:
            raise ValueError("update needs a start datetime")
        line = cron_line(module_command(module, args), start, cycle_days, tag)
        new = upsert_job(current, tag, line)
    elif action == "remove":
        new = remove_job(current, tag)
    else:
        raise ValueError(f"unknown schedule action: {action}")
    _run(new)
    return new
