"""Pool already-recorded scalebench attempt files and publish the median.

`tools/bench_attempts.py` runs its attempts inside one process and only
publishes at the end — if the process dies mid-batch (this sandbox's
sessions are time-boxed), the per-attempt snapshots it wrote
(`BENCH/scaling.attemptK.json` / `BENCH/BASELINE.attemptK.md`) survive on
disk but nothing pools them. This tool resumes exactly that situation: it
reads EVERY attempt file present (there must be as many as the declared
batch size — no partial pooling, that would be selection), publishes the
median-efficiency attempt via :func:`publish_median` (the same helper
bench_attempts.py uses, so the live-batch and resume paths cannot drift),
and archives the per-attempt JSONs under BENCH/attempts_r{round}/ instead
of deleting them.

Usage: python tools/pool_attempts.py <declared_batch_size> <round>
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
BENCH = REPO / "BENCH"


def publish_median(results: list[dict], snapshot_for) -> tuple[int, list[float]]:
    """Publish the median-efficiency attempt: copy its scaling.json /
    BASELINE.md verbatim, augment scaling.json with the full efficiency
    list, and append the all-attempts table. ``results`` carry
    ``_attempt`` numbers; ``snapshot_for(attempt_no)`` returns that
    attempt's ``(scaling_json_path, baseline_md_path)``. Returns the index
    of the published attempt within ``results`` and all efficiencies."""
    order = sorted(range(len(results)), key=lambda i: results[i]["scaling_efficiency"])
    med = order[len(order) // 2] if len(order) % 2 else order[len(order) // 2 - 1]
    effs = [r["scaling_efficiency"] for r in results]
    sj, smd = snapshot_for(results[med]["_attempt"])
    shutil.copy(sj, BENCH / "scaling.json")
    shutil.copy(smd, BENCH / "BASELINE.md")
    published = json.loads((BENCH / "scaling.json").read_text())
    published["attempt_efficiencies"] = effs
    published["published_attempt"] = results[med]["_attempt"]
    published["selection"] = "median"
    (BENCH / "scaling.json").write_text(json.dumps(published, indent=2))
    lines = "\n".join(
        f"| {r['_attempt']} | {r['scaling_efficiency']} | "
        f"{r['throughput_N_docs_per_sec']} | {r['throughput_4N_docs_per_sec']} |"
        f"{' **published (median)**' if i == med else ''}"
        for i, r in enumerate(results)
    )
    with open(BENCH / "BASELINE.md", "a") as f:
        f.write(
            f"\n## All attempts (median published, no ratchet)\n\n"
            f"| attempt | efficiency | N docs/s | 4N docs/s |\n|---|---|---|---|\n"
            f"{lines}\n\n"
            f"Efficiencies across {len(effs)} complete attempts: {effs} "
            f"(published median {effs[med]}, min {min(effs)}, max {max(effs)}).\n"
        )
    return med, effs


def main() -> None:
    declared = int(sys.argv[1])
    rnd = int(sys.argv[2])
    attempts = sorted(
        BENCH.glob("scaling.attempt*.json"),
        key=lambda p: int(p.stem.split("attempt")[1]),
    )
    if len(attempts) != declared:
        raise SystemExit(
            f"declared batch size {declared} but found {len(attempts)} attempt "
            f"files — refusing to pool a partial batch (that would be selection)"
        )
    results = []
    for p in attempts:
        r = json.loads(p.read_text())
        r["_attempt"] = int(p.stem.split("attempt")[1])
        results.append(r)

    def snapshot_for(n: int):
        return (BENCH / f"scaling.attempt{n}.json", BENCH / f"BASELINE.attempt{n}.md")

    med, effs = publish_median(results, snapshot_for)
    archive = BENCH / f"attempts_r{rnd}"
    archive.mkdir(exist_ok=True)
    for p in attempts:
        shutil.move(str(p), archive / p.name)
    for p in BENCH.glob("BASELINE.attempt*.md"):
        p.unlink()
    print(
        f"pooled {len(effs)} attempts: median attempt {results[med]['_attempt']} "
        f"efficiency {effs[med]}; all={effs}"
    )


if __name__ == "__main__":
    main()
