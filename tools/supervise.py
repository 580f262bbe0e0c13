"""External run watchdog: launch a (resumable) run tool, watch its
progress file, kill-and-resume on stall.

The deployment ops problem this solves (docs/STREAMER_STUDY.md,
docs/GLOW_STUDY.md): the tunneled TPU hangs ~once per multi-hour run —
the process blocks mid-execution with zero CPU and never returns — and a
manual kill + `--resume` loses whatever was computed since the last
checkpoint at best, or the whole run when nobody is watching. The
reference has no equivalent (its MPI runs simply die; SURVEY.md §5
failure detection); this supervisor is the process-level complement to
the framework's numerical reject/retry fault handling.

Usage:
  python tools/supervise.py --progress /tmp/bagheri/relative_error.log \
      --stall 900 --max-restarts 50 -- \
      python tools/bagheri_run.py --out /tmp/bagheri --resume ...

The child command MUST be resumable (include --resume); it is re-executed
verbatim after each stall kill. Progress = mtime of the given file(s);
compile phases are covered by --grace (no-progress allowance after each
(re)start).
"""

import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path


def newest_mtime(paths):
    t = 0.0
    for p in paths:
        try:
            t = max(t, Path(p).stat().st_mtime)
        except OSError:
            pass
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--progress", action="append", required=True,
                    help="file(s) whose mtime indicates forward progress "
                         "(e.g. the run's relative error.log)")
    ap.add_argument("--stall", type=float, default=900.0,
                    help="seconds without progress before kill+resume")
    ap.add_argument("--grace", type=float, default=2400.0,
                    help="no-progress allowance right after a (re)start "
                         "(covers compile time)")
    ap.add_argument("--max-restarts", type=int, default=50)
    ap.add_argument("--log", type=Path, default=None,
                    help="supervisor log file (default: stdout)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the run command")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "pass the run command after --"

    def log(msg):
        line = f"[supervise {time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        if args.log:
            with open(args.log, "a") as f:
                f.write(line + "\n")

    restarts = 0
    while True:
        log(f"launching (restart {restarts}): {' '.join(cmd)}")
        # new process group so the kill cannot touch the supervisor itself
        child = subprocess.Popen(cmd, start_new_session=True)
        started = time.time()
        last = newest_mtime(args.progress)
        last_change = started
        while True:
            rc = child.poll()
            if rc is not None:
                if rc == 0:
                    log("child exited cleanly — done")
                    return 0
                log(f"child exited rc={rc}")
                break
            time.sleep(20.0)
            now = time.time()
            cur = newest_mtime(args.progress)
            if cur > last:
                last, last_change = cur, now
            allowance = args.grace if (now - started) < args.grace \
                else args.stall
            if now - last_change > allowance:
                log(f"STALL: no progress for {now - last_change:.0f}s — "
                    f"killing pid {child.pid} (process group)")
                try:
                    os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                except OSError as e:
                    log(f"kill failed: {e}")
                child.wait()
                break
        restarts += 1
        if restarts > args.max_restarts:
            log("max restarts exceeded — giving up")
            return 1
        time.sleep(10.0)


if __name__ == "__main__":
    sys.exit(main())
