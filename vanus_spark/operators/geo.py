"""Geospatial radius join via grid-cell blocking.

"All pairs within R km" is a cross join written naively — at 100 TB it
must become an equi-join Catalyst can hash-partition. The standard
trick (uber/h3, Sedona's grid partitioner) is to quantize coordinates
into grid cells sized so that any two points within R km land in the
same or adjacent cells; the candidate join is then an equi-join on the
cell key with the smaller side exploded to its 3x3 neighborhood, and
the exact haversine predicate filters candidates afterwards.

Shuffle shape: one equi-join on (cell_x, cell_y) — both sides hash-
partition by cell, candidates are bounded by local density, and no
executor ever sees the full table. The 9x explosion happens on the
side the caller declares smaller (dims, typically broadcastable).

Determinism note: haversine uses sin/cos/asin, so the last-ulp
behavior is libm-specific; callers comparing across engines should
keep thresholds away from attainable distances (tests assert the
fixture margin, the semantic-dedup precedent).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

EARTH_KM = 6371.0
#: km per degree of latitude (and of longitude at the equator).
KM_PER_DEG = 111.0
#: one multiply by this folded constant on BOTH engines — Java's
#: Math.toRadians computes x/180*pi while DuckDB folds x*(pi/180),
#: which can differ in the last ulp; a shared literal removes that.
DEG_TO_RAD = math.pi / 180.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km, the textbook haversine formula.
    Arithmetic is written so an oracle can restate it operation-for-
    operation (left-associated products, DEG_TO_RAD literal)."""
    dlat = (lat2 - lat1) * F.lit(DEG_TO_RAD) / 2
    dlon = (lon2 - lon1) * F.lit(DEG_TO_RAD) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(
        lat1 * F.lit(DEG_TO_RAD)
    ) * F.cos(lat2 * F.lit(DEG_TO_RAD)) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * EARTH_KM) * F.asin(F.sqrt(a))


def cell_deg_for(radius_km: float, max_abs_lat: float = 60.0) -> float:
    """Grid pitch (degrees) such that any two points within
    ``radius_km`` at latitudes up to ``max_abs_lat`` differ by at most
    one cell per axis: the longitude degree shrinks by cos(lat), so
    the pitch is sized for the worst latitude the data can hold."""
    return radius_km / (KM_PER_DEG * math.cos(math.radians(max_abs_lat)))


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_cols: tuple[str, str] = ("lat", "lon"),
    right_cols: tuple[str, str] = ("lat2", "lon2"),
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``, as an equi-join.

    ``right`` is the exploded (9x) side — pass the smaller table
    there. Output keeps every column of both inputs plus ``dist_km``
    (unrounded; callers round for presentation)."""
    pitch = cell_deg_for(radius_km, max_abs_lat)
    llat, llon = left_cols
    rlat, rlon = right_cols
    lt = left.withColumn(
        "_cx", F.floor(F.col(llon) / pitch).cast("long")
    ).withColumn("_cy", F.floor(F.col(llat) / pitch).cast("long"))
    offsets = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({dx}L AS dx, {dy}L AS dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    rt = (
        right.withColumn(
            "_rcx", F.floor(F.col(rlon) / pitch).cast("long")
        )
        .withColumn("_rcy", F.floor(F.col(rlat) / pitch).cast("long"))
        .withColumn("_o", offsets)
        .withColumn("_cx", F.col("_rcx") + F.col("_o.dx"))
        .withColumn("_cy", F.col("_rcy") + F.col("_o.dy"))
        .drop("_rcx", "_rcy", "_o")
    )
    dist = haversine_km(F.col(llat), F.col(llon), F.col(rlat), F.col(rlon))
    return (
        lt.join(rt, ["_cx", "_cy"])
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= radius_km)
        .drop("_cx", "_cy")
    )


#: geohash base32 alphabet (no a, i, l, o) — the public standard.
GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_from_micro(
    lat_e6: Column, lon_e6: Column, precision: int = 5
) -> Column:
    """Geohash cell string from INTEGER micro-degree coordinates —
    the standard bit-interleave (lon first, MSB first) over quantized
    lat/lon, emitted as base32.

    Exactness: cell numbers come from floor((e6 + offset) * 2^bits /
    span) where numerator and denominator are exact integers well
    under 2^53 — the IEEE double division is provably floor-exact
    there (the remainder's fractional part is >= 1/span ~ 5.6e-9,
    four orders above the division's max error), so any engine
    derives the identical cell. The interleave is a STATIC sum of
    5*precision shift terms — plan size linear in bits, never the
    per-level expression rebinding that made the unrolled hilbert
    walk explode. lat_e6 in [-90e6, 90e6], lon_e6 in [-180e6,
    180e6]; the top edge clamps into the last cell.

    Precision is capped at 9: the floor-exactness argument needs
    (e6 + offset) * 2^nbits < 2^53, and precision 10 puts lon_nbits
    at 25 (360e6 * 2^25 ~ 1.2e16 > 2^53), where the double cast
    loses integer exactness and cells could diverge cross-engine.
    """
    if not 1 <= precision <= 9:
        raise ValueError(
            "geohash_from_micro precision must be in [1, 9]: above 9 "
            "the cell numerator exceeds 2^53 and floor-exactness "
            "(the cross-engine contract) no longer holds"
        )
    total_bits = 5 * precision
    lon_nbits = (total_bits + 1) // 2
    lat_nbits = total_bits // 2

    def cellnum(e6: Column, offset: int, span: int, nbits: int) -> Column:
        raw = F.floor(
            ((e6 + offset) * (1 << nbits)).cast("double") / span
        ).cast("long")
        return F.least(F.lit((1 << nbits) - 1), raw)

    latnum = cellnum(lat_e6, 90_000_000, 180_000_000, lat_nbits)
    lonnum = cellnum(lon_e6, 180_000_000, 360_000_000, lon_nbits)
    # interleave, lon gets the even positions counted from the MSB
    terms = []
    for i in range(lon_nbits):
        terms.append(
            F.shiftleft(
                F.shiftright(lonnum, lon_nbits - 1 - i).bitwiseAND(1),
                total_bits - 1 - 2 * i,
            )
        )
    for i in range(lat_nbits):
        terms.append(
            F.shiftleft(
                F.shiftright(latnum, lat_nbits - 1 - i).bitwiseAND(1),
                total_bits - 2 - 2 * i,
            )
        )
    g = terms[0]
    for t in terms[1:]:
        g = g + t
    alphabet = F.array(*[F.lit(c) for c in GEOHASH32])
    chars = [
        F.element_at(
            alphabet,
            (
                F.shiftright(g, total_bits - 5 * (k + 1)).bitwiseAND(31)
                + 1
            ).cast("int"),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)
