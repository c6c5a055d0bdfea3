"""Opportunistic steal-quiet bench runner (round-12, VERDICT r11 #7).

Two rounds of close benches were steal-rejected because co-tenant
storms come in 10-30 min waves and a manual launch keeps missing the
quiet windows. This watcher inverts the workflow: it samples host
steal continuously and LAUNCHES the full bench the moment a window
opens (and no local pytest/correctness run would contaminate the
timings), then checks ``bench_queries.json``'s own steal gate for an
ACCEPTED pass. First accepted bench wins: the stdout JSON line is
copied to ``--out`` and the watcher exits 0. If every window closes
mid-run it retries up to ``--max-runs``.

The quiet threshold matches the bench's own per-pass gate rate
(~6 ticks/s band on this host, gated at 900 ticks per ~180 s pass =
5 ticks/s): we require the 30 s probe to be under 150 ticks before
committing ~20 min of bench wall to the window.

Usage: python tools/quiet_bench_watcher.py [--max-runs N] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def probe_quiet(window_s: int = 30, max_ticks: int = 150) -> tuple[bool, int]:
    s0 = steal_ticks()
    time.sleep(window_s)
    d = steal_ticks() - s0
    return d <= max_ticks, d


def local_load_conflict() -> bool:
    out = subprocess.run(
        ["ps", "-eo", "args"], capture_output=True, text=True
    ).stdout
    return any(
        k in line
        for line in out.splitlines()
        for k in ("pytest", "check_correctness", "ab_bench", "_soak")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-runs", type=int, default=4)
    ap.add_argument("--out", default="/tmp/quiet_bench_result.json")
    ap.add_argument("--probe-ticks", type=int, default=150)
    args = ap.parse_args()

    runs = 0
    while runs < args.max_runs:
        quiet, d = probe_quiet(max_ticks=args.probe_ticks)
        busy = local_load_conflict()
        print(f"[watcher] probe: {d} ticks/30s quiet={quiet} local_busy={busy}", flush=True)
        if not quiet or busy:
            time.sleep(90)
            continue
        runs += 1
        print(f"[watcher] window open -> bench run {runs}", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True,
            text=True,
            cwd=str(REPO),
        )
        wall = time.time() - t0
        detail = json.loads((REPO / "bench_queries.json").read_text())
        attempts = detail["steal_gate"]["attempts"]
        accepted = [a for a in attempts if a["accepted"]]
        tp_ok = not detail["steal_gate"].get("throughput_exhausted", True)
        print(
            f"[watcher] bench rc={proc.returncode} wall={wall:.0f}s "
            f"accepted_passes={len(accepted)}/{len(attempts)} throughput_ok={tp_ok}",
            flush=True,
        )
        if proc.returncode == 0 and accepted:
            final = [
                ln for ln in proc.stdout.splitlines()
                if '"orestes_spark_total_query_time"' in ln
            ]
            Path(args.out).write_text(
                json.dumps(
                    {
                        "accepted_attempts": accepted,
                        "all_attempts": attempts,
                        "throughput_exhausted": detail["steal_gate"].get(
                            "throughput_exhausted"
                        ),
                        "final_line": final[-1] if final else None,
                        "wall_s": round(wall, 1),
                    },
                    indent=1,
                )
            )
            print(f"[watcher] ACCEPTED bench captured -> {args.out}", flush=True)
            return 0
        print("[watcher] window closed mid-run; retrying", flush=True)
    print("[watcher] exhausted max runs without an accepted pass", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
