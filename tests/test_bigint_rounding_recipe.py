"""Property pin for the sign-branch BIGINT rounding recipe (added r15).

Eight queries now round exact rationals entirely in integer arithmetic
(agg_seasonality_profile, ext_calibration_bins, ext_winsorized_mean,
f_math_std, sql_top_returned_customers, sql_market_share,
win_leave_one_out, ext_text_readability) via the same formula:

    round_half_away(num/den, k) * 10^k
        = (num * 2 * 10^k + den) div (2 * den)          for num >= 0
        = -(((-num) * 2 * 10^k + den) div (2 * den))    for num <  0

with den > 0 and `div` the floor/truncating integer division both
engines implement identically on nonnegative operands. Every re-key so
far hand-verified boundary cases; this pins the ALGEBRA itself against
exact Fraction arithmetic over the whole input space, so the next
re-key inherits a proven recipe instead of a precedent. The recipe's
correctness argument: for x = num/den >= 0, half-away rounding at k
digits is floor(x*10^k + 1/2), and floor(num*10^k/den + 1/2) =
(num*2*10^k + den) div (2*den) exactly — the +den implements the +1/2
over the common denominator 2*den; negatives reduce to the positive
case by |.| symmetry of half-AWAY (not half-even) rounding.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def sign_branch_round(num: int, den: int, k: int) -> int:
    """The shipped recipe, verbatim (returns the scaled integer —
    callers divide by 10^k as a final exact double mapping)."""
    assert den > 0
    p = 10**k
    if num >= 0:
        return (num * 2 * p + den) // (2 * den)
    return -(((-num) * 2 * p + den) // (2 * den))


def exact_half_away(num: int, den: int, k: int) -> int:
    """Oracle: exact Fraction arithmetic, round half AWAY from zero."""
    x = Fraction(num, den) * 10**k
    q, r = divmod(abs(x.numerator), x.denominator)
    # half-away: fractional part >= 1/2 rounds the magnitude up
    up = 2 * r >= x.denominator
    mag = q + (1 if up else 0)
    return mag if x >= 0 else -mag


@settings(max_examples=2000)
@given(
    num=st.integers(min_value=-(10**15), max_value=10**15),
    den=st.integers(min_value=1, max_value=10**9),
    k=st.integers(min_value=0, max_value=6),
)
def test_sign_branch_recipe_matches_exact_half_away(num, den, k):
    assert sign_branch_round(num, den, k) == exact_half_away(num, den, k)


def test_known_boundary_cases():
    """The cross-engine flips that motivated the recipe, as fixed points:
    -9.38375 (r7 seasonality), 213.63375 (r13 calibration bin, n=8),
    60.67375 (r15 flesch) — all exact .xxxx5 rationals at k=4, each
    rounding half AWAY from zero deterministically."""
    assert sign_branch_round(-938375, 100000, 4) == -93838   # -9.3838
    assert sign_branch_round(213633750, 1000000, 4) == 2136338
    assert sign_branch_round(6067375, 100000, 4) == 606738   # 60.6738
    # scale-invariance in (num, den): the recipe depends only on the
    # rational, not its representation
    assert sign_branch_round(6067375 * 3, 100000 * 3, 4) == 606738
