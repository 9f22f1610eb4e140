"""Pure-python identity pins for the pipeline21 (round-15 bank seed)
operators — same discipline as test_round19/test_round16/17: re-derive
each statistic with Fraction/float on random small inputs and pin the
cleared-denominator identities AND the literal constants, so a future
driver-green hash proves the STATISTIC, not merely engine agreement.
"""

from __future__ import annotations

import math
import random
from fractions import Fraction


def test_witten_bell_mass_identities():
    rng = random.Random(521)
    for _ in range(60):
        t = rng.randint(1, 500)
        n = rng.randint(t, 10**6)  # tokens >= types
        mass = Fraction(t, n + t)
        assert 0 < mass < 1
        # WB discounted MLE masses sum to 1: sum_c c/(N+T) + T/(N+T) = 1
        assert Fraction(n, n + t) + mass == 1
        cmax = rng.randint(max(1, n // t), n)
        assert (10**9 * cmax) // (n + t) == int(10**9 * Fraction(cmax, n + t))


def test_log_odds_monroe_antisymmetry_and_monotonicity():
    rng = random.Random(523)

    def delta(y1, n1, y2, n2, v):
        return math.log((y1 + 1.0) / (n1 + v - y1 - 1.0)) - math.log(
            (y2 + 1.0) / (n2 + v - y2 - 1.0)
        )

    for _ in range(60):
        v = rng.randint(5, 200)
        n1, n2 = rng.randint(v, 10**4), rng.randint(v, 10**4)
        y1, y2 = rng.randint(0, n1 - v), rng.randint(0, n2 - v)
        # swapping the corpora negates the statistic
        assert abs(delta(y1, n1, y2, n2, v) + delta(y2, n2, y1, n1, v)) < 1e-12
        # strictly increasing in the focal corpus count
        if y1 + 1 <= n1 - v:
            assert delta(y1 + 1, n1, y2, n2, v) > delta(y1, n1, y2, n2, v)


def test_blau_iqv_cleared():
    rng = random.Random(541)
    for _ in range(60):
        cs = [rng.randint(0, 400) for _ in range(5)]
        n = sum(cs)
        if n == 0:
            continue
        blau = 1 - sum(Fraction(c, n) ** 2 for c in cs)
        assert Fraction(n * n - sum(c * c for c in cs), n * n) == blau
        iqv = blau * Fraction(5, 4)
        assert Fraction(5 * (n * n - sum(c * c for c in cs)), 4 * n * n) == iqv
        assert 0 <= blau <= Fraction(4, 5) and 0 <= iqv <= 1


def test_cpm_cleared_denominator():
    rng = random.Random(547)
    tgt = 25
    for _ in range(60):
        xs = [rng.randint(1, 50) for _ in range(rng.randint(3, 40))]
        n, s = len(xs), sum(xs)
        s2 = sum(x * x for x in xs)
        mean = Fraction(s, n)
        var = Fraction(n * s2 - s * s, n * n)
        denom_ref = var + (mean - tgt) ** 2
        denom_int = Fraction(n * s2 - s * s + (s - n * tgt) ** 2, n * n)
        assert denom_int == denom_ref
        if denom_ref > 0:
            width2 = 49 * 49
            cpm2 = Fraction(width2, 36) / denom_ref
            assert Fraction(width2 * n * n, 36 * (n * s2 - s * s + (s - n * tgt) ** 2)) == cpm2


def test_huber_constant_and_clip_behavior():
    # the 1e7-scaled clip constant: 1.345 * 1.4826 exactly
    assert 1345 * 14826 == 19940970
    rng = random.Random(557)
    for _ in range(60):
        xs = [rng.randint(1, 50) for _ in range(rng.randint(5, 60))]
        n = len(xs)
        med = sorted(xs)[(n - 1) // 2]
        mad = sorted(abs(x - med) for x in xs)[(n - 1) // 2]
        lo = 10**7 * med - 19940970 * mad
        hi = 10**7 * med + 19940970 * mad
        clipped = [min(max(10**7 * x, lo), hi) for x in xs]
        est = Fraction(sum(clipped), n)
        assert lo <= est <= hi  # bounded influence
        if mad >= 50:  # clip interval covers the whole 1..50 domain
            assert est == Fraction(10**7 * sum(xs), n)


def test_lcm_literal_and_mean_chain():
    from mongodb_nats_connector_spark.operators.pipeline21 import _L50

    assert _L50 == math.lcm(*range(1, 51))
    rng = random.Random(563)
    for _ in range(60):
        xs = [rng.randint(1, 50) for _ in range(rng.randint(2, 50))]
        n = len(xs)
        sinv = sum(_L50 // x for x in xs)
        h = Fraction(n * _L50, sinv)
        a = Fraction(sum(xs), n)
        c = Fraction(sum(x * x for x in xs), sum(xs))
        assert h == n / sum(Fraction(1, x) for x in xs)
        assert h <= a <= c
        # contraharmonic = arithmetic + variance/mean (population)
        var = Fraction(n * sum(x * x for x in xs) - sum(xs) ** 2, n * n)
        assert c == a + var / a


def test_tarone_cleared_identity():
    rng = random.Random(569)
    for _ in range(60):
        ys = [rng.randint(0, 4) for _ in range(rng.randint(5, 60))]
        g = len(ys)
        m = 4 * g
        yy = sum(ys)
        if yy == 0 or yy == m:
            continue
        p = Fraction(yy, m)
        s_ref = sum((y - 4 * p) ** 2 for y in ys) / (p * (1 - p))
        q = sum((m * y - 4 * yy) ** 2 for y in ys)
        assert Fraction(q, yy * (m - yy)) == s_ref
        z2_ref = (s_ref - m) ** 2 / (24 * g)
        assert Fraction(
            (q - m * yy * (m - yy)) ** 2,
            24 * g * yy * yy * (m - yy) ** 2,
        ) == z2_ref


def test_hill_inversion_scale():
    rng = random.Random(571)
    for _ in range(40):
        # top-k sample from an exact Pareto-like ladder
        xs = sorted(
            (rng.randint(1001, 10**6) for _ in range(51)), reverse=True
        )
        x51 = xs[50]
        inv_sum_micro = sum(
            math.floor(10**6 * math.log(x / x51)) for x in xs[:50]
        )
        if inv_sum_micro <= 0:
            continue
        inv_alpha = inv_sum_micro / (50 * 10**6)
        alpha_micro = (50 * 10**12) // inv_sum_micro
        # the literal 5e13 = 1e6 (micro) * 50 / 1e-6 (term scale)
        assert abs(alpha_micro / 10**6 - 1 / inv_alpha) < 1e-4 * (
            1 / inv_alpha
        )
