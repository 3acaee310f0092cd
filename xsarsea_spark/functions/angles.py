"""Angle-convention conversions (dual-compiled expressions).

Parity target: xsarsea ``detrend.py:96-201`` scalar functions. All take
degrees and return degrees except ``dir_meteo_to_sample`` which returns
radians (matching the reference's convention).
"""

from __future__ import annotations

import math

from xsarsea_spark.expr import Expr, _as_expr, fmod_floor, radians

__all__ = [
    "dir_meteo_to_sample",
    "dir_sample_to_meteo",
    "dir_meteo_to_oceano",
    "dir_oceano_to_meteo",
    "dir_to_180",
    "dir_to_360",
    "db_to_linear",
    "linear_to_db",
]


def dir_meteo_to_sample(meteo_dir, ground_heading) -> Expr:
    """Meteo direction (deg north) -> image convention (rad, anticlockwise
    from sample axis)."""
    return math.pi / 2.0 - radians(_as_expr(meteo_dir) - _as_expr(ground_heading))


def dir_sample_to_meteo(sample_dir, ground_heading) -> Expr:
    """Image direction (deg, anticlockwise from sample) -> meteo deg north."""
    return 90.0 - _as_expr(sample_dir) + _as_expr(ground_heading)


def dir_meteo_to_oceano(meteo_dir) -> Expr:
    """Meteo ('from') -> oceanographic ('to') convention, degrees."""
    return fmod_floor(_as_expr(meteo_dir) + 180.0, 360.0)


def dir_oceano_to_meteo(oceano_dir) -> Expr:
    """Oceanographic ('to') -> meteo ('from') convention, degrees."""
    return fmod_floor(_as_expr(oceano_dir) - 180.0, 360.0)


def dir_to_180(angle) -> Expr:
    """Wrap degrees into [-180, 180)."""
    return fmod_floor(_as_expr(angle) + 180.0, 360.0) - 180.0


def dir_to_360(angle) -> Expr:
    """Wrap degrees into [0, 360)."""
    return fmod_floor(_as_expr(angle) + 360.0, 360.0)


def db_to_linear(x) -> Expr:
    """dB -> linear: 10**(x/10) (xsarsea models.py:219-222)."""
    from xsarsea_spark.expr import power

    return power(10.0, _as_expr(x) / 10.0)


def linear_to_db(x) -> Expr:
    """linear -> dB with epsilon clamp: 10*log10(x + 1e-15)
    (xsarsea models.py:210-216)."""
    from xsarsea_spark.expr import log10

    return 10.0 * log10(_as_expr(x) + 1e-15)
