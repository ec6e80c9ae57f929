"""Driver-environment drift gate: the entry contract must work on a
SparkSession built with NO configs, from a foreign cwd — the harness
owns the session, not us. Covers the two drift classes that have
actually bitten: TIMESTAMP(NANOS) reads without nanosAsLong (the
round-4 events_sessionize regression) and Python workers that cannot
import the package (PYTHONPATH set after JVM launch)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .appName("bare_gate").config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
qs = e.queries()
assert e.entry(spark).count() > 0                       # worker imports (mapInPandas)
assert qs["events_tumbling_agg"](spark, {sf!r}).count() > 0   # NANOS read + UTC strings
assert qs["events_asof_attribution"](spark, {sf!r}).count() > 0
print("BARE_OK")
"""


def test_entry_contract_on_bare_session(tmp_path):
    script = _SCRIPT.format(repo=REPO, sf="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),          # foreign cwd, like the harness
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BARE_OK" in proc.stdout
