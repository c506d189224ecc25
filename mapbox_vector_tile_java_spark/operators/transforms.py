"""Explicit, opt-in lossy transforms — the engine analog of the reference's
simplify stage (SURVEY §2.B B8: ``TopologyPreservingSimplifier.simplify``,
JtsAdapter.java:257, the one deliberately lossy step in its pipeline).

The codec path itself is lossless BY CONTRACT (north rule: bit-identical
decode). Size-for-fidelity trades therefore live here as *separate,
explicit* DataFrame transforms a user applies BEFORE encoding — the loss is
visible in the plan, never hidden inside a codec. Everything is plain
Catalyst (whole-stage codegen) and ANSI-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantize_round(df: DataFrame, cols: dict[str, int]) -> DataFrame:
    """Round float columns to ``digits`` decimals (lossy, explicit).

    cols: {column: digits}. The rounded column REPLACES the original, so
    downstream encode sees low-entropy values (dict_int/byteplane then
    compress them well) — precision reduction buying bytes, exactly the
    simplify trade (JtsAdapter.java:257) restated for columns.
    """
    out = df
    for c, digits in cols.items():
        out = out.withColumn(c, F.round(F.col(c), digits))
    return out


def truncate_timestamps(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """Truncate timestamp columns to a unit ('second'|'minute'|'hour'|
    'day') — the temporal quantizer (lossy, explicit). Truncated streams
    form long sorted runs, the RLE/delta codecs' best case."""
    out = df
    for c, unit in cols.items():
        out = out.withColumn(c, F.date_trunc(unit, F.col(c)))
    return out
