"""Complex wind-vector helpers over (re, im) column pairs.

Parity target: the reference's complex ops on wind vectors
(``windspeed.py:236-247,272-276,422``; ``test_xsarsea.py:87-88``):
modulus = speed, argument = direction relative to the antenna; built
as reusable dual-compiled expressions since Spark has no complex type
(SURVEY.md §1.2).
"""

from __future__ import annotations

from xsarsea_spark.expr import Expr, atan2, cos, degrees, radians, sin, sqrt
from xsarsea_spark.expr import _as_expr

__all__ = [
    "wind_speed", "wind_dir_rad", "wind_dir_deg",
    "wind_re", "wind_im", "angle_diff_rad",
]


def wind_speed(re, im) -> Expr:
    """|w| = sqrt(re^2 + im^2)."""
    re, im = _as_expr(re), _as_expr(im)
    return sqrt(re * re + im * im)


def wind_dir_rad(re, im) -> Expr:
    """arg(w) in (-pi, pi]."""
    return atan2(_as_expr(im), _as_expr(re))


def wind_dir_deg(re, im) -> Expr:
    return degrees(wind_dir_rad(re, im))


def wind_re(speed, dir_deg) -> Expr:
    """speed * exp(i * dir) real part."""
    return _as_expr(speed) * cos(radians(_as_expr(dir_deg)))


def wind_im(speed, dir_deg) -> Expr:
    return _as_expr(speed) * sin(radians(_as_expr(dir_deg)))


def angle_diff_rad(re_a, im_a, re_b, im_b) -> Expr:
    """Wrapped angle difference arg(a / b) via the conjugate product
    (the reference's ``np.angle(anc / sol)`` idiom)."""
    re_a, im_a = _as_expr(re_a), _as_expr(im_a)
    re_b, im_b = _as_expr(re_b), _as_expr(im_b)
    qr = re_a * re_b + im_a * im_b
    qi = im_a * re_b - re_a * im_b
    return atan2(qi, qr)
