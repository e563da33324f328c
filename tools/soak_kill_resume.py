"""SIGKILL a medium-scale crawl mid-run, resume, compare to uninterrupted.

Evidence tool for the T4 idempotent-replay invariant beyond the unit
suite (BASELINE.md "Crash-resume soak"): a hard kill mid-crawl, then
run_crawl(resume=True), must converge to EXACTLY the uninterrupted
run's seen set and article url set.  Run from the repo root:

    python tools/soak_kill_resume.py

Uses the cached t2 corpus; ~3 min.  Asserts the resumed process popped
>0 urls (i.e. the kill genuinely landed mid-run — rerun if the host
was fast enough to finish before the kill timer).
"""
import glob, json, os, shutil, signal, subprocess, sys, time

import pyarrow.parquet as pq

WORKER = '''
import sys, shutil
import ray
from ray.data import DataContext
sys.path.insert(0, "/root/repo")
ray.init(address="local", num_cpus=8, include_dashboard=False)
DataContext.get_current().enable_tensor_extension_casting = False
from pttcrawler_ray.fixtures import corpus_for_scale
from pttcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
corpus = corpus_for_scale("t2")
out, resume = sys.argv[1], sys.argv[2] == "resume"
cfg = CrawlConfig(engine="actors", num_shards=4, process_concurrency=4,
                  batch_size=256, round_seconds=1e6, seen_capacity=1_000_000,
                  checkpoint_every=3)
s = run_crawl(corpus, out, cfg, resume=resume)
print("POPPED", s["popped"], flush=True)
ray.shutdown()
'''
open("/tmp/soak_worker.py", "w").write(WORKER)

def seen_set(out):
    files = sorted(glob.glob(os.path.join(out, "seen", "round=*", "*.parquet")))
    import pyarrow as pa
    return set(pa.concat_tables([pq.read_table(f) for f in files])["url"].to_pylist())

def articles(out):
    files = sorted(glob.glob(os.path.join(out, "articles", "round=*", "*.parquet")))
    import pyarrow as pa
    t = pa.concat_tables([pq.read_table(f, columns=["url", "error"]) for f in files])
    return t

shutil.rmtree("/tmp/soak", ignore_errors=True)
# reference: uninterrupted run (timed — the kill point scales to it, so
# the soak stays meaningful across this host's 8-28-core load regimes)
ref_out = "/tmp/soak/ref"
t0 = time.time()
r = subprocess.run([sys.executable, "/tmp/soak_worker.py", ref_out, "fresh"],
                   capture_output=True, text=True, timeout=900)
ref_wall = time.time() - t0
assert "POPPED" in r.stdout, r.stderr[-2000:]
print("reference run done:", r.stdout.strip().splitlines()[-1],
      f"({ref_wall:.1f}s)")

# victim: SIGKILL at ~55% of the measured reference wall, then resume
kill_out = "/tmp/soak/kill"
p = subprocess.Popen([sys.executable, "/tmp/soak_worker.py", kill_out, "fresh"],
                     stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
time.sleep(max(6.0, 0.55 * ref_wall))
p.send_signal(signal.SIGKILL)
p.wait()
print("killed mid-run; checkpoints:", len(glob.glob(os.path.join(kill_out, "checkpoint", "*"))))
r = subprocess.run([sys.executable, "/tmp/soak_worker.py", kill_out, "resume"],
                   capture_output=True, text=True, timeout=900)
assert "POPPED" in r.stdout, r.stderr[-2000:]
resumed_popped = int(r.stdout.strip().splitlines()[-1].split()[-1])
print("resumed run done, popped:", resumed_popped)
assert resumed_popped > 0, "kill landed after completion — not a mid-run test"

a, b = seen_set(ref_out), seen_set(kill_out)
print("seen sets equal:", a == b, len(a), len(b))
ta, tb = articles(ref_out), articles(kill_out)
import pandas as pd
da = ta.to_pandas().drop_duplicates("url").sort_values("url").reset_index(drop=True)
db = tb.to_pandas().drop_duplicates("url").sort_values("url").reset_index(drop=True)
print("article url sets equal:", set(da["url"]) == set(db["url"]), len(da), len(db))
assert a == b and set(da["url"]) == set(db["url"])
print("SOAK PASS")
