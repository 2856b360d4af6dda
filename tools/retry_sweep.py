"""Dynamic half of the task-retry determinism sweep (r09 verdict task
4): run the REAL oracle gate with every task eligible for a duplicate
speculative attempt, on a genuine multi-executor cluster.

Spark re-executes tasks — speculatively when an attempt looks slow,
and from scratch on failure.  If any expression published different
bytes on a second attempt (the hazard tools/nondeterminism_scan.py
hunts statically), the winning-attempt lottery would flip value
hashes.  This sweep makes the lottery actually happen:

- master = local-cluster[2, C, M]: a real standalone mini-cluster with
  TWO executor JVMs (speculation never launches on local[N] — a
  speculative copy must run on a different executor than the
  original, and local mode has exactly one);
- spark.speculation=true with quantile 0.1 / multiplier 1.01 /
  interval 20ms: after 10% of a stage's tasks finish, every task
  running longer than ~1.01x the median gets a duplicate attempt on
  the other executor;
- the comparator is tools/check_correctness.py itself — the identical
  hash/rowcount/schema gate the driver runs.

Results must be byte-identical to the plain-local run: scheduling
decides WHICH attempt wins, never the answer.

Usage:
    python tools/retry_sweep.py [sf_dir] [key ...]

Record full-registry runs in docs/SCALE_SWEEP.md.  PYTHONPATH is
propagated to the executor env so Arrow-seam UDFs can unpickle
package references inside the executor JVMs' Python workers.
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
    env = {
        **os.environ,
        "ADP_SWEEP_CONF": conf,
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
