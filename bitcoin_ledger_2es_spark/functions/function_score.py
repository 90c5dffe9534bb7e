"""ES function_score surface: decay functions (gauss / exp / linear),
field_value_factor, deterministic random_score, and the boost_mode /
score_mode combination rules (public semantics: the ES function_score
query and Lucene's FunctionScoreQuery).

Everything here is a pure column expression — whole-stage-codegen
JVM-side, no UDF — so a function-scored ranking adds zero shuffles beyond
the base query: it is a projection over the hit frame at any corpus size.
All closed-form constants (the gauss exponent multiplier, the linear
span) are precomputed driver-side in Python floats and embedded as
literals, which is what lets a DuckDB oracle reproduce the arithmetic
bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def decay_col(
    kind: str,
    field: Column,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
) -> Column:
    """ES decay function over a numeric field.

    dist = max(0, |field - origin| - offset); the function equals 1 inside
    ``offset`` of ``origin`` and exactly ``decay`` at distance ``scale``:

      * gauss:  exp(-dist^2 * ln(1/decay) / scale^2)
      * exp:    exp(-dist * ln(1/decay) / scale)
      * linear: max(0, (span - dist) / span), span = scale / (1 - decay)
    """
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    dist = F.greatest(
        F.abs(field.cast("double") - F.lit(float(origin))) - F.lit(float(offset)),
        F.lit(0.0),
    )
    if kind == "gauss":
        c = -math.log(decay) / (float(scale) ** 2)  # ln(1/decay)/scale^2
        return F.exp(-(dist * dist) * F.lit(c))
    if kind == "exp":
        c = -math.log(decay) / float(scale)
        return F.exp(-dist * F.lit(c))
    if kind == "linear":
        span = float(scale) / (1.0 - float(decay))
        return F.greatest((F.lit(span) - dist) / F.lit(span), F.lit(0.0))
    raise ValueError(f"unknown decay kind {kind!r} (gauss | exp | linear)")


def field_value_factor_col(
    field: Column,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float = 1.0,
) -> Column:
    """ES field_value_factor: modifier(factor * field), NULL -> missing."""
    v = F.coalesce(field.cast("double"), F.lit(float(missing))) * F.lit(float(factor))
    mods = {
        "none": lambda x: x,
        "log": lambda x: F.log10(x),
        "log1p": lambda x: F.log10(x + 1.0),
        "log2p": lambda x: F.log10(x + 2.0),
        "ln": lambda x: F.log(x),
        "ln1p": lambda x: F.log(x + 1.0),
        "ln2p": lambda x: F.log(x + 2.0),
        "square": lambda x: x * x,
        "sqrt": lambda x: F.sqrt(x),
        "reciprocal": lambda x: F.lit(1.0) / x,
    }
    if modifier not in mods:
        raise ValueError(f"unknown modifier {modifier!r}")
    return mods[modifier](v)


_RS_KNUTH = 2654435761
_RS_M32 = 1 << 32


def random_score_col(id_col: Column, seed: int = 0) -> Column:
    """ES random_score with a seed + field: deterministic per-doc uniform
    in [0, 1), reproducible across runs and parallelism. Uses the same
    overflow-safe Knuth multiplicative hash as train_val_split (exactly
    SQL-expressible — the point of not using xxhash64 here)."""
    x = F.pmod(F.pmod(id_col, F.lit(_RS_M32)) + F.lit(int(seed)), F.lit(_RS_M32))
    hi, lo = F.floor(x / F.lit(1 << 16)), x % F.lit(1 << 16)
    h = F.pmod(
        F.pmod(hi * F.lit(_RS_KNUTH), F.lit(_RS_M32)) * F.lit(1 << 16)
        + lo * F.lit(_RS_KNUTH),
        F.lit(_RS_M32),
    )
    return h.cast("double") / F.lit(float(_RS_M32))


def rank_feature_col(
    feature: Column,
    function: str = "saturation",
    pivot: float = 1.0,
    boost: float = 1.0,
    scaling_factor: float = 1.0,
    exponent: float = 1.0,
) -> Column:
    """ES ``rank_feature`` query score for one doc feature (public ES
    semantics — the query usually sits in a bool ``should`` and ADDS to
    the relevance score, i.e. boost_mode='sum'):

      * saturation: boost * x / (x + pivot)
      * log:        boost * ln(scaling_factor + x)
      * sigmoid:    boost * x^exp / (x^exp + pivot^exp)

    Null/negative features score 0 (ES requires non-negative features;
    we clamp instead of failing the whole query). Pure column
    expression — a projection over the hit frame."""
    x = F.greatest(F.coalesce(feature.cast("double"), F.lit(0.0)), F.lit(0.0))
    b = F.lit(float(boost))
    if function == "saturation":
        return b * (x / (x + F.lit(float(pivot))))
    if function == "log":
        return b * F.log(F.lit(float(scaling_factor)) + x)
    if function == "sigmoid":
        xp = F.pow(x, F.lit(float(exponent)))
        pp = float(pivot) ** float(exponent)
        return b * (xp / (xp + F.lit(pp)))
    raise ValueError(f"unknown rank_feature function {function!r}")


def distance_feature_col(
    field: Column, origin: float, pivot: float, boost: float = 1.0
) -> Column:
    """ES ``distance_feature`` query score: boost * pivot / (pivot +
    |field - origin|) — 'boost results closer to the origin', equal to
    boost/2 exactly at ``pivot`` distance. Numeric/date fields alike
    (dates as epoch numbers). Null fields score 0 (no distance = no
    contribution, the ES unmatched behavior)."""
    if pivot <= 0:
        raise ValueError(f"pivot must be positive, got {pivot}")
    dist = F.abs(field.cast("double") - F.lit(float(origin)))
    p = F.lit(float(pivot))
    return F.coalesce(
        F.lit(float(boost)) * (p / (p + dist)), F.lit(0.0)
    )


def combine_functions(cols: list[Column], score_mode: str = "multiply") -> Column:
    """Fold several function values into one (ES score_mode)."""
    if not cols:
        raise ValueError("need at least one function column")
    if score_mode == "first":
        return cols[0]
    if score_mode == "max":
        return F.greatest(*cols) if len(cols) > 1 else cols[0]
    if score_mode == "min":
        return F.least(*cols) if len(cols) > 1 else cols[0]
    if score_mode in ("sum", "avg"):
        total = cols[0]
        for c in cols[1:]:
            total = total + c
        return total / F.lit(float(len(cols))) if score_mode == "avg" else total
    if score_mode == "multiply":
        prod = cols[0]
        for c in cols[1:]:
            prod = prod * c
        return prod
    raise ValueError(f"unknown score_mode {score_mode!r}")


def apply_boost_mode(
    query_score: Column, fn_value: Column, boost_mode: str = "multiply"
) -> Column:
    """Combine the query score with the folded function value (ES
    boost_mode)."""
    q = query_score.cast("double")
    modes = {
        "multiply": lambda: q * fn_value,
        "sum": lambda: q + fn_value,
        "avg": lambda: (q + fn_value) / F.lit(2.0),
        "replace": lambda: fn_value,
        "max": lambda: F.greatest(q, fn_value),
        "min": lambda: F.least(q, fn_value),
    }
    if boost_mode not in modes:
        raise ValueError(f"unknown boost_mode {boost_mode!r}")
    return modes[boost_mode]()
