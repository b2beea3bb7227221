"""Pins for session.tune() — the runtime-conf rail every public entry
point routes an externally owned (driver) session through.

r15 (ADVICE r14 low + VERDICT r14 #4): tune() now READS BACK its two
correctness-critical confs after the set loop instead of swallowing a
failure silently — timeZone=UTC (wrong zone = wrong answers vs the
UTC-naive storage/oracle layer) raises; ansi.enabled=true (the loud
out-of-range-node contract on pre-4.x) warns. Both paths are
unreachable on a healthy session, so these pins assert the healthy
contract: idempotent, warning-free, both criticals effective.
"""

from __future__ import annotations

import warnings

from kenshin_backup_spark.session import RUNTIME_CONFS, tune


def test_tune_is_idempotent_and_pins_criticals(spark):
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning → failure
        out = tune(spark)
        out = tune(out)  # idempotent: second pass must not warn either
    assert out is spark
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.ansi.enabled").lower() == "true"
    # every runtime conf either applied or was loudly adjudicated above
    for k, v in RUNTIME_CONFS.items():
        assert spark.conf.get(k, v) is not None
