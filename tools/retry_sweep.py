"""Dynamic half of the task-retry determinism sweep (r09 verdict task
4 → round 10): run the REAL oracle gate with genuine task
re-execution happening inside every long-enough stage, on a genuine
multi-executor cluster.

Spark re-executes tasks on failure/kill, and an expression that
publishes different bytes on a second attempt (the hazard class
tools/nondeterminism_scan.py hunts statically) would flip value
hashes depending on which attempt's output survives.  This sweep
makes re-execution actually happen, via TWO mechanisms at once:

- master = local-cluster[2, C, M]: a real standalone mini-cluster
  with TWO executor JVMs — real serialization boundaries, real
  shuffle fetches between separate processes, real executor-side
  Python workers (PYTHONPATH propagated so Arrow-seam UDFs unpickle);
- ADP_CHAOS_KILL: check_correctness's driver-side chaos thread kills
  a hash-picked sample of RUNNING first task attempts through
  SparkContext.killTaskAttempt.  TaskKilled does NOT count toward
  spark.task.maxFailures, so each killed (stage, partition) is
  re-enqueued and re-executes exactly once — genuine duplicate
  attempts on live registry keys with zero changes to the keys.

Why not spark.speculation: speculative duplicates CANNOT launch on a
single machine — TaskSetManager.dequeueSpeculativeTask requires the
copy to run on a different HOST, not merely a different executor
(verified empirically: a 2-executor local-cluster with an 8s
straggler, quantile 0.1, multiplier 1.01, interval 20ms launches
zero speculative attempts per the status REST API).  The conf is
still set — it must at minimum not corrupt anything — but the chaos
kills are what actually exercise re-execution.  spark.task.maxFailures
stays at 4 so a key whose re-run path is broken fails loudly rather
than silently succeeding on attempt 1.

The comparator is tools/check_correctness.py itself — the identical
hash/rowcount/schema gate the driver runs.  Results must be
byte-identical to the plain-local run: scheduling decides WHICH
attempt's output survives, never the answer.

Usage:
    python tools/retry_sweep.py [sf_dir] [key ...]

Record full-registry runs in docs/SCALE_SWEEP.md.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SWEEP_MASTER = "local-cluster[2,8,8192]"

SWEEP_CONF = {
    "spark.speculation": "true",
    "spark.speculation.quantile": "0.1",
    "spark.speculation.multiplier": "1.01",
    "spark.speculation.interval": "20ms",
    "spark.task.maxFailures": "4",
    # executor JVMs spawn their own Python workers: they need the repo
    # on the import path to unpickle Arrow-seam closures
    "spark.executorEnv.PYTHONPATH": str(REPO),
    # keep per-executor memory honest (2 x 8 GiB executors + driver)
    "spark.executor.memory": "8g",
}


def main() -> int:
    args = sys.argv[1:]
    conf = ",".join(f"{k}={v}" for k, v in SWEEP_CONF.items())
    # merge (not overwrite) a caller-provided ADP_SWEEP_CONF so the
    # compound-failure shape composes: e.g. adp.checkpoint.root +
    # spark.cleaner.referenceTracking.cleanCheckpoints ride along for a
    # reliable-ckpt chaos run (round 12 — caller pairs win on conflict,
    # they are appended last and session builder applies in order)
    extra = os.environ.get("ADP_SWEEP_CONF", "").strip(",")
    if extra:
        conf = f"{conf},{extra}"
    env = {
        **os.environ,
        "ADP_SWEEP_CONF": conf,
        # kill ~25% of first attempts: real re-execution in every
        # stage long enough for the 50ms chaos poll to observe
        "ADP_CHAOS_KILL": os.environ.get("ADP_CHAOS_KILL", "0.25"),
        # master rides its own env var: the URL's commas would break
        # ADP_SWEEP_CONF's k=v,k=v parsing (session.py seam)
        "SPARK_GRAFT_MASTER": SWEEP_MASTER,
        "PYTHONPATH": str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    return subprocess.call(
        [sys.executable, "tools/check_correctness.py", *args],
        env=env,
        cwd=str(REPO),
    )


if __name__ == "__main__":
    raise SystemExit(main())
