"""Worker-crash fault tolerance for the dedup pipeline.

SIGKILLs Ray worker processes mid-way through the 1M-doc minhash dedup
soak and asserts the job still completes with the EXACT planted result —
the stateless-task + lineage-reconstruction story that carries to worker
loss on a real cluster (complement to ``soak_kill_resume.py``, which
kills the DRIVER and exercises checkpoint resume).

Victims are chosen strictly from the soak subprocess's own process tree
(its raylet's ``ray::``/default_worker children), never from any other
live Ray session on the host.

Run from the repo root:  python tools/soak_dedup_kill.py
(uses the cached 1M corpus from soak_dedup_scale.py; ~2-4 min)
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KILL_AFTER_S = 20.0
N_VICTIMS = 2


def _descendants(root_pid: int) -> list[int]:
    """All descendant pids of root_pid via /proc (no psutil in env)."""
    children: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                ppid = int(f.read().split()[3])
        except OSError:
            continue
        children.setdefault(ppid, []).append(int(pid))
    out, stack = [], [root_pid]
    while stack:
        for c in children.get(stack.pop(), []):
            out.append(c)
            stack.append(c)
    return out


def _cmdline(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return ""


def main():
    err = open("/tmp/soak_dedup_kill_child.err", "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "soak_dedup_scale.py")],
        cwd=REPO, stdout=subprocess.PIPE, stderr=err, text=True)
    time.sleep(KILL_AFTER_S)
    # victims: workers ACTIVELY RUNNING a data task (their proc title is
    # "ray::<TaskName>") — never idle workers or Ray-internal named actors
    # (StatsActor / autoscaler / _StatsActor would take the session down,
    # which is a different failure mode than worker loss)
    def _is_task_worker(cmd: str) -> bool:
        # active data-task workers are titled "ray::<task>" (e.g.
        # "ray::map", "ray::sort", "ray::MapBatches(...)"); exclude idle
        # workers and internal named actors ("ray::IDLE",
        # "ray::_StatsActor"), whose loss is a different failure mode
        return (cmd.startswith("ray::")
                and "IDLE" not in cmd and "Actor" not in cmd)

    victims = [p for p in _descendants(proc.pid)
               if _is_task_worker(_cmdline(p).strip())]
    assert victims, "no active Ray data-task workers under the soak " \
                    "process at kill time — adjust KILL_AFTER_S"
    killed = []
    for p in victims[:N_VICTIMS]:
        try:
            os.kill(p, signal.SIGKILL)
            killed.append(p)
        except ProcessLookupError:
            pass
    out, _ = proc.communicate(timeout=1800)
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    res_out = {
        "metric": "dedup worker-kill fault tolerance (SIGKILL mid-run, "
                  "lineage reconstruction)",
        "killed_workers": len(killed),
        "killed_after_s": KILL_AFTER_S,
        "soak_rc": proc.returncode,
        "soak_total_sec": res.get("total_sec"),
        "exact_match_after_kill": res.get("exact_match"),
    }
    print(json.dumps(res_out))
    assert proc.returncode == 0, proc.returncode
    assert res.get("exact_match") is True, res


if __name__ == "__main__":
    main()
