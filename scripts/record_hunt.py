#!/usr/bin/env python
"""Probe-gated record attempts: wait for a healthy tunnel hour, then
run one driver-style bench (`timeout 600 python -u bench.py`).

The dev tunnel's weather swings by the hour along two independent
dimensions (bulk bandwidth and executable-load latency; see CLAUDE.md),
and 2026-08-20 added a third failure shape — bulk uploads wedged while
small transfers stayed fast. A record attempt on a bad hour burns ten
minutes and lands the native fallback, so: probe first, bench only when
both dimensions are healthy, repeat. Writes everything under --out and
touches ``BENCH_RUNNING`` there while a bench is in flight (so an
interactive session can avoid racing a heavy foreground job against
the measurement on this 1-core box).

Usage: python scripts/record_hunt.py [--out DIR] [--iters N]
       [--sleep S] [--min-mbps M] [--max-load L] [--serve N_FILES]
Stops early once a bench emits a device-path headline (no
``native-fallback`` marker) with rc=0; with --serve it then also runs
``bench_serve.py N_FILES 4`` inside the same healthy window (the
serving aggregate is bandwidth-capped, so it needs the same weather
the single-stream records were measured in).
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def probe(out_dir, tag):
    p = out_dir / f"probe_{tag}.json"
    with open(p, "w") as f:
        r = subprocess.run(
            ["timeout", "150", sys.executable, str(REPO / "scripts/tunnel_probe.py")],
            stdout=f, stderr=subprocess.DEVNULL, cwd=REPO)
    full = None
    for line in p.read_text().splitlines():
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if obj.get("metric") == "tunnel_probe":
            full = obj
    return full, r.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/record_hunt")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sleep", type=float, default=600.0)
    ap.add_argument("--min-mbps", type=float, default=25.0)
    ap.add_argument("--max-load", type=float, default=1.5)
    ap.add_argument("--serve", type=int, default=0,
                    help="after a device-path record, run bench_serve.py N 4")
    ap.add_argument("--direct", action="store_true",
                    help="skip the pre-probe and run bench every cycle; "
                    "right when the tunnel flaps on minute scale (observed "
                    "2026-08-20 ~10:40: a probe-healthy window closed before "
                    "bench's ~90 s tunnel-immune prep finished) — bench "
                    "self-gates its device stage with its own probe, so a "
                    "wedged attempt costs ~5 min of native stages, not 10")
    args = ap.parse_args()
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    flag = out_dir / "BENCH_RUNNING"

    for i in range(args.iters):
        tag = time.strftime("%H%M%S")
        go = args.direct
        if not args.direct:
            full, rc = probe(out_dir, tag)
            if full is None:
                print(f"[{tag}] probe wedged/failed (rc={rc}); sleeping", flush=True)
            elif (full["upload_mbps"] < args.min_mbps
                  or full["exec_load_s"] > args.max_load):
                print(f"[{tag}] unhealthy: {full['upload_mbps']} MB/s, "
                      f"load {full['exec_load_s']} s; sleeping", flush=True)
            else:
                print(f"[{tag}] healthy ({full['upload_mbps']} MB/s, "
                      f"{full['rtt_ms']} ms, load {full['exec_load_s']} s) "
                      f"— benching", flush=True)
                go = True
        if go:
            bj = out_dir / f"bench_{tag}.json"
            flag.touch()
            try:
                with open(bj, "w") as f, open(out_dir / f"bench_{tag}.err", "w") as e:
                    r = subprocess.run(
                        ["timeout", "600", sys.executable, "-u",
                         str(REPO / "bench.py")],
                        stdout=f, stderr=e, cwd=REPO)
            finally:
                flag.unlink(missing_ok=True)
            text = bj.read_text()
            print(text.strip(), flush=True)
            if r.returncode == 0 and text and '"native-fallback"' not in text:
                print("device-path record landed", flush=True)
                if args.serve:
                    sj = out_dir / f"serve_{tag}.json"
                    flag.touch()
                    try:
                        with open(sj, "w") as f:
                            subprocess.run(
                                ["timeout", "900", sys.executable, "-u",
                                 str(REPO / "scripts/bench_serve.py"),
                                 str(args.serve), "4"],
                                stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
                    finally:
                        flag.unlink(missing_ok=True)
                    print(sj.read_text().strip()[-2000:], flush=True)
                return 0
        time.sleep(args.sleep)
    return 1


if __name__ == "__main__":
    sys.exit(main())
