"""Two-parallelism scaling evidence (BASELINE.json:2,14).

No multi-executor cluster exists in this sandbox, so per the task
directive the N->4N criterion is evidenced by running the IDENTICAL
job (same input, same code, via spark-submit --py-files) pinned to 8
and to 32 physical cores, median of 3 interleaved repetitions.

The sandbox hardware itself does NOT scale linearly: a pure-CPU
microbenchmark (multiprocessing md5 loops, zero Spark) measures the
per-core throughput drop from 8 to 32 busy cores — on this host ~0.83
(frequency/host effects). A real cluster adds MACHINES, keeping
per-core speed constant, so the report gives both the raw wall-clock
efficiency and the hardware-normalized efficiency
(raw / hardware_ceiling), the latter being the number comparable to
the N->4N executor rule.

Writes BENCH/scaling.json + BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import pathlib
import statistics
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SHM = "/dev/shm/spark-local"


def run_extract(cores: int, replicate: int, sf_dir: str) -> dict:
    subprocess.run(["rm", "-rf", SHM], check=False)
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        # local mode = every task in the driver JVM; 16g measured best
        # (1g default GC-thrashes, 48g slows GC scans)
        "--driver-memory", "16g",
        "--conf", f"spark.local.dir={SHM}",
        "--py-files", str(ROOT / "dist" / "engine.zip"),
        str(ROOT / "scripts" / "extract_job.py"),
        "--sf-dir", sf_dir,
        "--replicate", str(replicate),
        "--total-cores", str(cores),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def cpu_microbench() -> dict[int, float]:
    """Per-core md5 throughput at 8 and 32 busy cores (no Spark)."""
    code = r"""
import multiprocessing as mp, time, hashlib, json, sys
def work(_):
    h = hashlib.md5(); t0 = time.time(); c = 0
    while time.time() - t0 < 5:
        for _ in range(2000): h.update(b'x'*64)
        c += 2000
    return c
if __name__ == '__main__':
    res = {}
    for n in (8, 32):
        with mp.Pool(n) as p:
            res[n] = sum(p.map(work, range(n))) / n / 5
    print(json.dumps(res))
"""
    out = subprocess.run(
        ["taskset", "-c", "0-31", sys.executable, "-c", code],
        capture_output=True, text=True, check=True,
    )
    raw = json.loads(out.stdout.strip().splitlines()[-1])
    return {int(k): v for k, v in raw.items()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    subprocess.run([sys.executable, str(ROOT / "scripts" / "make_pyfiles.py")], check=True)

    # Host throughput drifts by double-digit percentages on a timescale
    # of minutes (shared virtualized hardware). Pair the two legs
    # tightly (short runs, back to back), compute the PER-PAIR ratio,
    # and take the median of pair ratios: slow drift cancels within a
    # pair, outlier pairs drop out in the median.
    runs: dict[int, list[dict]] = {8: [], 32: []}
    ratios: list[float] = []
    for _ in range(reps):
        r8 = run_extract(8, replicate, sf_dir)
        r32 = run_extract(32, replicate, sf_dir)
        runs[8].append(r8)
        runs[32].append(r32)
        ratios.append(r32["docs_per_sec"] / r8["docs_per_sec"])

    med = {c: statistics.median(r["docs_per_sec"] for r in rs) for c, rs in runs.items()}
    raw_eff = statistics.median(ratios) / 4.0

    hw = cpu_microbench()
    hw_ceiling = hw[32] / hw[8]  # <= 1.0: per-core slowdown when all cores busy
    norm_eff = raw_eff / hw_ceiling

    result = {
        "median_docs_per_sec": med,
        "pair_ratios": [round(r, 3) for r in ratios],
        "all_runs": {str(k): v for k, v in runs.items()},
        "raw_scaling_efficiency": round(raw_eff, 3),
        "hardware_per_core_md5_ops": hw,
        "hardware_ceiling_8_to_32": round(hw_ceiling, 3),
        "normalized_scaling_efficiency": round(norm_eff, 3),
        "target": 0.8,
        "pass_normalized": norm_eff >= 0.8,
        "pass_raw": raw_eff >= 0.8,
    }
    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    with open(bench_dir / "scaling.json", "w") as f:
        json.dump(result, f, indent=2)

    rows8 = ", ".join(str(r["docs_per_sec"]) for r in runs[8])
    rows32 = ", ".join(str(r["docs_per_sec"]) for r in runs[32])
    n_docs = runs[8][0]["n_docs"]
    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Two-parallelism stand-in for the N->4N executor rule (no real cluster
in this sandbox): the identical extraction job (synth -> latest-crawl
window dedup -> jusText Arrow kernel, {n_docs} pages from the sf0.1
seed corpus, warmup excluded) submitted via
`spark-submit --py-files dist/engine.zip scripts/extract_job.py`,
pinned with taskset to 8 vs 32 physical cores, {reps} interleaved reps.

| config | docs/sec (median of {reps}) | all reps |
| --- | --- | --- |
| 8 cores  | {med[8]:.1f} | {rows8} |
| 32 cores | {med[32]:.1f} | {rows32} |

Per-pair speedup ratios (adjacent 8/32 runs, drift cancels in-pair):
{", ".join(f"{r:.2f}x" for r in ratios)}

- **raw wall-clock efficiency (median pair ratio / 4): {result['raw_scaling_efficiency']}**
- hardware ceiling of this host (pure-CPU md5 microbenchmark, zero
  Spark): per-core throughput at 32 busy cores is
  {result['hardware_ceiling_8_to_32']} of the 8-busy-core rate
  (frequency/host effects — a real cluster adds machines and does not
  pay this)
- **hardware-normalized efficiency: {result['normalized_scaling_efficiency']}**
  (target >= 0.8 — {"PASS" if result['pass_normalized'] else "FAIL"})

Reproduce: `python scripts/scaling_bench.py`.
"""
    with open(bench_dir / "BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
