"""Round-trip verification: decoded table must be bit-identical to source.

The reference's correctness discipline is whole-object round-trip equality
(MvtBuildTest.java:141-308 ``assertEquals(expected, actual)``); ours is a
distributed set-equality check (exceptAll both ways, SURVEY §2.D "set ops")
plus content-CRC spot checks at the Arrow level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def verify_roundtrip(source: DataFrame, decoded: DataFrame) -> dict:
    """Distributed bit-identity check. Returns a report dict; raises on
    mismatch. Order-insensitive (our decode does not promise row order)."""
    n_src = source.count()
    n_dec = decoded.count()
    missing = source.exceptAll(decoded.select(*source.columns)).count()
    extra = decoded.select(*source.columns).exceptAll(source).count()
    report = {"n_source": n_src, "n_decoded": n_dec,
              "missing_rows": missing, "extra_rows": extra,
              "ok": n_src == n_dec and missing == 0 and extra == 0}
    if not report["ok"]:
        raise AssertionError(f"round-trip mismatch: {report}")
    return report
