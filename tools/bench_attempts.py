"""Run several complete scalebench attempts and publish the MEDIAN one.

Replaces the former best-of ratchet (`bench_until.sh`): efficiency is a
ratio of two noisy maxima on a host with documented 2.5x run-to-run
variance, so keeping the max over attempts biased the published number
upward (ADVICE r1). This wrapper runs each attempt with the full protocol,
records every attempt's efficiency, and publishes the attempt with the
median efficiency — its BENCH/scaling.json and BENCH/BASELINE.md verbatim,
plus an all-attempts section appended so the spread is visible.

Usage: python tools/bench_attempts.py [attempts] [sf_dir] [html_copies] [repeat]
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
BENCH = REPO / "BENCH"


def main() -> None:
    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    extra = sys.argv[2:]
    results: list[dict] = []
    snapshots: list[tuple[pathlib.Path, pathlib.Path]] = []
    for i in range(attempts):
        t0 = time.monotonic()
        # attempt 1 materializes the deterministic corpus; later attempts
        # reuse it (scalebench validates corpus_meta.json against this
        # run's parameters, so a stale cache is refused, not mismeasured) —
        # generation is outside the timed region either way, this only
        # drops ~8 redundant multi-minute corpus builds per 9-attempt batch
        env = {**os.environ, "SCALEBENCH_PUBLISH": "1"}
        if i > 0:
            env["SCALEBENCH_REUSE"] = "1"
        proc = subprocess.run(
            [sys.executable, str(REPO / "scalebench.py"), *extra],
            cwd=str(REPO), capture_output=True, text=True,
            # only the batch harness may write the canonical BENCH
            # artifacts; bare scalebench runs land in BENCH/*.run.*
            env=env,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout[-1000:] + proc.stderr[-3000:])
            raise SystemExit(f"attempt {i + 1} failed")
        res = json.loads((BENCH / "scaling.json").read_text())
        res["_attempt"] = i + 1
        res["_attempt_wall_s"] = round(time.monotonic() - t0, 1)
        results.append(res)
        sj = BENCH / f"scaling.attempt{i + 1}.json"
        smd = BENCH / f"BASELINE.attempt{i + 1}.md"
        shutil.copy(BENCH / "scaling.json", sj)
        shutil.copy(BENCH / "BASELINE.md", smd)
        snapshots.append((sj, smd))
        print(
            f"attempt {i + 1}/{attempts}: efficiency "
            f"{res['scaling_efficiency']} "
            f"(N {res['throughput_N_docs_per_sec']} docs/s, "
            f"4N {res['throughput_4N_docs_per_sec']} docs/s)",
            flush=True,
        )

    # publish via the shared helper so the live-batch and resume
    # (tools/pool_attempts.py) paths cannot drift
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from pool_attempts import publish_median

    med, effs = publish_median(
        results,
        lambda n: (BENCH / f"scaling.attempt{n}.json",
                   BENCH / f"BASELINE.attempt{n}.md"),
    )
    for s_j, s_md in snapshots:
        s_j.unlink(missing_ok=True)
        s_md.unlink(missing_ok=True)
    print(f"published attempt {med + 1} (median): efficiency {effs[med]}; all={effs}")


if __name__ == "__main__":
    main()
