"""ES geo surface: geo_distance filter/sort and the geo_distance
aggregation, as pure column expressions (whole-stage codegen, no UDF).

Public semantics: ES geo_distance query/agg use great-circle distance on
the mean-Earth-radius sphere (Lucene SloppyMath / GeoUtils
EARTH_MEAN_RADIUS = 6371008.7714150598 m). We pin that constant and the
degrees->radians factor as literals so a SQL oracle reproduces the
arithmetic bit-for-bit (trig ULP noise aside — both engines are IEEE
libm, agreement is well inside the contract's 6dp rounding).

geo_bounding_box is the simple non-dateline-crossing box (documented
subset; ES handles lon wrap — our transcripts domain has no geo data at
all, these exist for the standard-catalog surface over derived or
user-supplied coordinate columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Lucene GeoUtils.EARTH_MEAN_RADIUS, in km
EARTH_RADIUS_KM = 6371.0087714150598
#: degrees -> radians (pi/180), pinned as a literal on both sides
DEG2RAD = 0.017453292519943295


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine, asin form):
    2R * asin(sqrt(sin^2(dlat/2) + cos(lat1) cos(lat2) sin^2(dlon/2))).
    Association order is part of the oracle contract — mirror exactly."""
    rlat1 = lat1.cast("double") * F.lit(DEG2RAD)
    rlat2 = lat2.cast("double") * F.lit(DEG2RAD)
    dlat2 = (lat2.cast("double") - lat1.cast("double")) * F.lit(DEG2RAD) / F.lit(2.0)
    dlon2 = (lon2.cast("double") - lon1.cast("double")) * F.lit(DEG2RAD) / F.lit(2.0)
    a = (
        F.sin(dlat2) * F.sin(dlat2)
        + F.cos(rlat1) * F.cos(rlat2) * (F.sin(dlon2) * F.sin(dlon2))
    )
    # near-antipodal points can push a to 1 +/- 1 ULP: clamp before asin
    # (asin(>1) is NaN) — same least() on the oracle side. NOTE for
    # oracle authors: asin is ULP-amplifying near 1, so pick comparison
    # origins OFF the data's coordinate grid to keep exact antipodes out
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.least(F.sqrt(a), F.lit(1.0)))


def geo_distance_filter(
    lat: Column, lon: Column, origin_lat: float, origin_lon: float,
    radius_km: float,
) -> Column:
    """ES geo_distance query: distance(point, origin) <= radius.
    Boolean column — composes with doc_filter / DataFrame.filter."""
    d = haversine_km(lat, lon, F.lit(float(origin_lat)), F.lit(float(origin_lon)))
    return d <= F.lit(float(radius_km))


def geo_bounding_box(
    lat: Column, lon: Column,
    top_left: tuple[float, float], bottom_right: tuple[float, float],
) -> Column:
    """ES geo_bounding_box query (non-dateline-crossing box):
    bottom <= lat <= top AND left <= lon <= right."""
    top, left = float(top_left[0]), float(top_left[1])
    bottom, right = float(bottom_right[0]), float(bottom_right[1])
    if left > right:
        raise ValueError(
            "dateline-crossing boxes (left > right) are not supported — "
            "split into two boxes"
        )
    la, lo = lat.cast("double"), lon.cast("double")
    return (
        (la <= F.lit(top)) & (la >= F.lit(bottom))
        & (lo >= F.lit(left)) & (lo <= F.lit(right))
    )


def geo_distance_agg(
    df: DataFrame,
    lat: Column,
    lon: Column,
    origin_lat: float,
    origin_lon: float,
    ranges: list[tuple[str, float | None, float | None]],
    metrics=None,
) -> DataFrame:
    """ES geo_distance aggregation: range buckets over the distance from
    an origin (from inclusive, to exclusive, km) — one conditional-agg
    pass via the shared range_agg builder over a projected distance
    column. Returns (key, doc_count, *metrics) in the given order."""
    from ..operators.aggs import range_agg

    d = haversine_km(lat, lon, F.lit(float(origin_lat)), F.lit(float(origin_lon)))
    return range_agg(
        df.withColumn("__geo_dist_km", d), "__geo_dist_km", ranges,
        metrics=metrics,
    )


#: Web-Mercator latitude clamp (ES GeoTileUtils.LATITUDE_MASK bound)
GEOTILE_MAX_LAT = 85.05112878
#: pi pinned as a literal so oracles share the exact mercator divisor
PI = 3.141592653589793


def geotile_key(lat: Column, lon: Column, zoom: int) -> Column:
    """ES geotile_grid bucket key 'z/x/y' (slippy-map / Web-Mercator
    tiles) as a pure column expression:

        x = floor(((lon + 180) / 360) * 2^z)
        y = floor((1 - ln(tan(r) + 1/cos(r)) / pi) / 2 * 2^z),
            r = radians(lat clamped to +/-85.05112878)

    both clamped to [0, 2^z - 1] (lon=180 / the pole rows land in the
    last tile, per ES GeoTileUtils). The expression — association order
    included — is the oracle contract; tile edges for integer-degree
    test grids sit far (>= 1/45 cell in x, irrational latitudes in y)
    from representable inputs, so cross-engine libm ULP noise cannot
    flip a floor."""
    if not 0 <= zoom <= 29:
        raise ValueError(f"zoom must be in [0, 29], got {zoom}")
    n = float(1 << zoom)
    la = lat.cast("double")
    lo = lon.cast("double")
    lat_c = F.least(F.greatest(la, F.lit(-GEOTILE_MAX_LAT)), F.lit(GEOTILE_MAX_LAT))
    x = F.floor(((lo + F.lit(180.0)) / F.lit(360.0)) * F.lit(n))
    x = F.least(F.greatest(x, F.lit(0).cast("long")), F.lit(int(n) - 1).cast("long"))
    r = lat_c * F.lit(DEG2RAD)
    merc = F.log(F.tan(r) + F.lit(1.0) / F.cos(r))
    y = F.floor((F.lit(1.0) - merc / F.lit(PI)) / F.lit(2.0) * F.lit(n))
    y = F.least(F.greatest(y, F.lit(0).cast("long")), F.lit(int(n) - 1).cast("long"))
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"), y.cast("string"))


#: geohash base32 alphabet (Niemeyer / ES GeoHashUtils — no a,i,l,o)
GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_plan(precision: int):
    """Shared bit plan for the Spark and SQL geohash builders: lon gets
    ceil(5p/2) bits, lat floor(5p/2); stream bit i (MSB-first) is a lon
    bit for even i, lat for odd — the standard Niemeyer interleave."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    nbits = 5 * precision
    xb, yb = (nbits + 1) // 2, nbits // 2
    plan = []  # (is_lon, source_bit, stream_shift)
    for i in range(nbits):
        if i % 2 == 0:
            plan.append((True, xb - 1 - i // 2, nbits - 1 - i))
        else:
            plan.append((False, yb - 1 - i // 2, nbits - 1 - i))
    return nbits, xb, yb, plan


def geohash_key(lat: Column, lon: Column, precision: int) -> Column:
    """ES geohash_grid bucket key: the ``precision``-char Niemeyer
    geohash as a pure column expression. Two deterministic floors
    quantize lon/lat to ceil(5p/2)/floor(5p/2)-bit cells

        x = floor((lon + 180) / 360 * 2^xb)   (clamped to [0, 2^xb - 1])
        y = floor((lat + 90) / 180 * 2^yb)

    then EVERYTHING is exact int64 bit arithmetic — interleave (lon
    first), 5-bit chunks, base32 chars — identical on any engine. The
    floor determinism argument matches geotile_key: for integer-degree
    inputs the pre-floor value is either exactly representable (ratio
    k/2^m when 45 | lon+180, resp. lat+90) or at least 1/45 from the
    nearest integer, so 1-ULP libm noise cannot flip a cell."""
    nbits, xb, yb, plan = _geohash_plan(precision)
    la, lo = lat.cast("double"), lon.cast("double")
    x = F.floor((lo + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << xb)))
    x = F.least(F.greatest(x, F.lit(0).cast("long")), F.lit((1 << xb) - 1).cast("long"))
    y = F.floor((la + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << yb)))
    y = F.least(F.greatest(y, F.lit(0).cast("long")), F.lit((1 << yb) - 1).cast("long"))
    z = F.lit(0).cast("long")
    for is_lon, src, shift in plan:
        bit = F.shiftright(x if is_lon else y, src).bitwiseAND(F.lit(1).cast("long"))
        z = z + F.shiftleft(bit, shift)
    chars = [
        F.substring(
            F.lit(GEOHASH_BASE32),
            (
                F.shiftright(z, 5 * (precision - 1 - j))
                .bitwiseAND(F.lit(31).cast("long"))
                + F.lit(1)
            ).cast("int"),
            1,
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql_parts(lat_sql: str, lon_sql: str, precision: int) -> dict:
    """The DuckDB twin of :func:`geohash_key`, generated from the SAME
    bit plan — every floor, shift, mask, and char lookup mirrors the
    Spark expression term for term (the oracle contract). Returned as
    staged pieces for a CTE pipeline (x/y over the coordinates, z over
    columns named x and y, key over a column named z):

        SELECT <x> AS x, <y> AS y FROM data
        -> SELECT (<z>) AS z FROM ...
        -> SELECT <key> AS key FROM ..."""
    nbits, xb, yb, plan = _geohash_plan(precision)
    x = (
        f"least(greatest(CAST(floor((({lon_sql}) + 180.0) / 360.0 * "
        f"{float(1 << xb)!r}) AS BIGINT), 0), {(1 << xb) - 1})"
    )
    y = (
        f"least(greatest(CAST(floor((({lat_sql}) + 90.0) / 180.0 * "
        f"{float(1 << yb)!r}) AS BIGINT), 0), {(1 << yb) - 1})"
    )
    z = " + ".join(
        f"((({'x' if is_lon else 'y'} >> {src}) & 1) << {shift})"
        for is_lon, src, shift in plan
    )
    key = " || ".join(
        f"substr('{GEOHASH_BASE32}', CAST(((z >> {5 * (precision - 1 - j)}) & 31)"
        f" + 1 AS INTEGER), 1)"
        for j in range(precision)
    )
    return {"x": x, "y": y, "z": z, "key": key}


def geohash_grid_agg(
    df: DataFrame, lat: Column, lon: Column, precision: int,
    size: int = 10_000,
) -> DataFrame:
    """ES geohash_grid aggregation: doc counts per geohash cell at
    ``precision``, top ``size`` by doc_count desc (key asc ties). Same
    shape as geotile_grid_agg — one partial-aggregated groupBy over a
    codegen key expression, cell cardinality bounded by 32^precision."""
    key = geohash_key(lat, lon, precision)
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def geo_centroid_agg(df: DataFrame, lat: Column, lon: Column, by=None) -> DataFrame:
    """ES geo_centroid aggregation: arithmetic mean of lat and lon
    (degree-space means, the ES definition for non-wrapping data),
    optionally per ``by`` group. The means are emitted as the closed
    form sum/count — mirror the division, not avg(), in oracles; feed
    integer-valued or fixed-point coordinates for bit-exact sums
    (float sums are shuffle-order-dependent otherwise)."""
    keys = [by] if isinstance(by, str) else list(by or [])
    g = df.groupBy(*keys) if keys else df.groupBy()
    out = g.agg(
        F.count("*").alias("doc_count"),
        F.sum(lat.cast("double")).alias("__slat"),
        F.sum(lon.cast("double")).alias("__slon"),
    )
    return out.select(
        *keys,
        "doc_count",
        (F.col("__slat") / F.col("doc_count")).alias("centroid_lat"),
        (F.col("__slon") / F.col("doc_count")).alias("centroid_lon"),
    )


def geo_bounds_agg(df: DataFrame, lat: Column, lon: Column, by=None) -> DataFrame:
    """ES geo_bounds aggregation: the smallest box covering the points —
    top = max lat, bottom = min lat, left = min lon, right = max lon
    (ES reports top_left/bottom_right; non-wrapping form). Exact
    min/max, no float-order concerns."""
    keys = [by] if isinstance(by, str) else list(by or [])
    g = df.groupBy(*keys) if keys else df.groupBy()
    return g.agg(
        F.count("*").alias("doc_count"),
        F.max(lat.cast("double")).alias("top"),
        F.min(lat.cast("double")).alias("bottom"),
        F.min(lon.cast("double")).alias("left"),
        F.max(lon.cast("double")).alias("right"),
    )


def geotile_grid_agg(
    df: DataFrame, lat: Column, lon: Column, zoom: int, size: int = 10_000
) -> DataFrame:
    """ES geotile_grid aggregation: doc counts per Web-Mercator tile at
    ``zoom``, top ``size`` tiles by doc_count desc (key asc ties — ES
    orders count desc). Plain groupBy over the key expression — partial
    aggregation and codegen apply; tile cardinality is bounded by 4^zoom,
    so the shuffle is tiny at sane zooms. Returns (key, doc_count)."""
    key = geotile_key(lat, lon, zoom)
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def geo_line_agg(
    df: DataFrame,
    lat: Column,
    lon: Column,
    sort_col: Column,
    tiebreak: Column,
    by=None,
    size: int = 10000,
) -> DataFrame:
    """ES geo_line aggregation (7.11+): per group, the points joined
    into a line ORDERED by ``sort_col``, truncated to the FIRST ``size``
    points (the ES ``size`` cap keeps the lowest sort values). ES leaves
    equal-sort ordering undefined; this engine REQUIRES an explicit
    unique ``tiebreak`` column so the line is a pure function of the
    data (the determinism contract — partitioning must never leak into
    content).

    One hash aggregation: collect (sort, tie, lon, lat) structs, sort
    lexicographically (array_sort — the struct field order IS the sort
    key), slice to ``size``, project the points. Map-side partial
    collect keeps the shuffle proportional to kept points; the cap is
    applied post-sort, so groups larger than ``size`` truncate exactly
    like ES. Returns (by..., doc_count = points kept,
    points = array<struct<lon, lat>> — GeoJSON axis order)."""
    if size <= 0:
        raise ValueError("geo_line size must be positive")
    keys = [by] if isinstance(by, str) else list(by or [])
    g = df.groupBy(*keys) if keys else df.groupBy()
    arr = F.slice(
        F.array_sort(F.collect_list(F.struct(
            sort_col.alias("s"),
            tiebreak.alias("t"),
            lon.cast("double").alias("lon"),
            lat.cast("double").alias("lat"),
        ))),
        1, size,
    )
    out = g.agg(arr.alias("__pts"))
    return out.select(
        *keys,
        F.size("__pts").cast("long").alias("doc_count"),
        F.transform(
            F.col("__pts"), lambda p: F.struct(p["lon"], p["lat"])
        ).alias("points"),
    )


def geo_grid_filter(
    lat: Column,
    lon: Column,
    geotile: "str | None" = None,
    geohash: "str | None" = None,
) -> Column:
    """ES 8.x ``geo_grid`` query: keep documents whose point falls in
    ONE named grid cell — the query twin of the geotile_grid /
    geohash_grid aggs (ES's documented use: drill into a grid bucket).
    Exactly one of ``geotile`` ('z/x/y') / ``geohash`` (base32 cell)
    may be given; the filter is key-equality against the SAME key
    expression the agg uses, so a returned bucket key always selects
    exactly its bucket's documents (bit-identical floors). A pure
    boolean column — composes with doc_filter everywhere, pushes into
    scans like any comparison. (ES also accepts geohex cells — H3
    needs a library this sandbox lacks; passing both or neither
    raises.)"""
    if (geotile is None) == (geohash is None):
        raise ValueError("geo_grid_filter takes exactly one of "
                         "geotile=/geohash=")
    if geotile is not None:
        parts = geotile.split("/")
        if len(parts) != 3:
            raise ValueError(f"geotile key must be 'z/x/y': {geotile!r}")
        zoom = int(parts[0])
        return geotile_key(lat, lon, zoom) == F.lit(geotile)
    if not geohash or any(c not in GEOHASH_BASE32 for c in geohash):
        raise ValueError(f"invalid geohash cell: {geohash!r}")
    return geohash_key(lat, lon, len(geohash)) == F.lit(geohash)
