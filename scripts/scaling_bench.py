"""Two-parallelism scaling evidence (BASELINE.json:2,14).

No multi-executor cluster exists in this sandbox, so per the task
directive the N->4N executor criterion is evidenced by running the
IDENTICAL job (same input, same code, via spark-submit --py-files) at
local[8] and local[32] and reporting throughput at both plus
efficiency = (docs_per_sec_32 / docs_per_sec_8) / 4  (target >= 0.8).

Writes BENCH/scaling.json and rewrites the measured section of
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def run_at(cores: int, replicate: int, sf_dir: str) -> dict:
    # Pin the process tree (JVM task threads AND Python workers) to
    # exactly `cores` physical cores: an unpinned local[8] run spills
    # its Python workers onto the other 24 cores, which simulates a
    # 2x-bigger cluster, not an 8-core one. Pinning makes the two runs
    # an honest stand-in for N-core vs 4N-core clusters.
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        # local mode runs every task in the driver JVM: the 1g default
        # heap GC-thrashes badly at high thread counts
        "--driver-memory", "48g",
        "--py-files", str(ROOT / "dist" / "engine.zip"),
        str(ROOT / "scripts" / "extract_job.py"),
        "--sf-dir", sf_dir,
        "--replicate", str(replicate),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    subprocess.run([sys.executable, str(ROOT / "scripts" / "make_pyfiles.py")], check=True)

    r8 = run_at(8, replicate, sf_dir)
    r32 = run_at(32, replicate, sf_dir)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / (32 / 8)
    result = {
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    with open(bench_dir / "scaling.json", "w") as f:
        json.dump(result, f, indent=2)

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Two-parallelism stand-in for the N->4N executor rule (no real cluster
in this sandbox; identical job + identical input via
`spark-submit --py-files dist/engine.zip scripts/extract_job.py`):

| config | docs | wall (s) | docs/sec |
| --- | --- | --- | --- |
| local[8]  | {r8['n_docs']} | {r8['wall_sec']} | {r8['docs_per_sec']} |
| local[32] | {r32['n_docs']} | {r32['wall_sec']} | {r32['docs_per_sec']} |

**Scaling efficiency (8 -> 32 cores, ideal 4.0x): {round(eff, 3)}**
(target >= 0.8 — {"PASS" if eff >= 0.8 else "FAIL"})

Pipeline measured: page synthesis (mapInPandas) -> latest-crawl window
dedup -> jusText extraction Arrow kernel -> count; replicate={replicate}
({r32['n_docs']} pages from the sf0.1 seed corpus). Warmup run excluded
(JVM + Python-worker startup).
"""
    with open(bench_dir / "BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
