"""Round-11 (pipeline15) unit pins that don't need a SparkSession.

The oracle-parity + bitexact probes cover end-to-end equivalence; these
tests pin the pieces where BOTH engines could share the same bug — pure
derivations that the cross-engine comparison is blind to (the
agg_siegel_tukey lesson: its first closed form probed bit-exact while
WRONG for N % 4 != 0; only the brute-force pin caught it).
"""

import random
from fractions import Fraction
from itertools import combinations


# ---------------------------------------------------------------------------
# Ansari-Bradley prefix S(p) (agg_lepage)
# ---------------------------------------------------------------------------


def _t(x: int) -> int:
    return (x * (x + 1)) // 2


def _s_closed(p: int, n: int) -> int:
    """The closed-form prefix used by agg_lepage:
    S(p) = T(min(p,h)) + [p>h](T(n-h) - T(n-p)), h = ceil(n/2)."""
    h = (n + 1) // 2
    s = _t(min(p, h))
    if p > h:
        s += _t(n - h) - _t(n - p)
    return s


def test_ansari_prefix_closed_form_bruteforce():
    for n in range(1, 81):
        scores = [min(i, n + 1 - i) for i in range(1, n + 1)]
        acc = 0
        for p in range(0, n + 1):
            if p > 0:
                acc += scores[p - 1]
            assert _s_closed(p, n) == acc, (n, p)


# ---------------------------------------------------------------------------
# Mood doubled-midrank block identity (agg_mood_scale)
# ---------------------------------------------------------------------------


def _midranks(values):
    """value -> midrank over the sorted multiset (ties get the average)."""
    sv = sorted(values)
    first = {}
    for i, v in enumerate(sv):
        first.setdefault(v, i + 1)
    count = {}
    for v in sv:
        count[v] = count.get(v, 0) + 1
    return {v: Fraction(2 * first[v] + count[v] - 1, 2) for v in count}


def test_mood_block_identity_bruteforce():
    rng = random.Random(1511)
    for _ in range(40):
        n = rng.randint(2, 200)
        vals = [rng.randint(1, 12) for _ in range(n)]
        grp = [rng.randint(0, 1) for _ in range(n)]
        mid = _midranks(vals)
        # direct: 4 * sum over treatment of (midrank - (N+1)/2)^2
        direct = sum(
            (2 * mid[v] - (n + 1)) ** 2 for v, g in zip(vals, grp) if g
        )
        assert direct.denominator == 1
        # block form: sum over cells of n1 * (2*lo0 + c - N)^2
        cells = {}
        for v, g in zip(vals, grp):
            c, n1 = cells.get(v, (0, 0))
            cells[v] = (c + 1, n1 + g)
        lo0, block = 0, 0
        for v in sorted(cells):
            c, n1 = cells[v]
            block += n1 * (2 * lo0 + c - n) ** 2
            lo0 += c
        assert block == int(direct)


# ---------------------------------------------------------------------------
# Permutation moments of a linear rank statistic (agg_mood_scale/agg_lepage)
# ---------------------------------------------------------------------------


def test_permutation_moments_match_enumeration():
    """E[T] = n*S1/N and Var[T] = n(N-n)(N*S2 - S1^2)/(N^2(N-1)) for the
    sum T of a simple random subset of size n from fixed scores —
    verified exactly (Fractions) against full subset enumeration."""
    rng = random.Random(42)
    for trial in range(10):
        nn = rng.randint(2, 9)
        n = rng.randint(1, nn - 1)
        scores = [rng.randint(-5, 9) for _ in range(nn)]
        subs = list(combinations(scores, n))
        ts = [sum(s) for s in subs]
        e_enum = Fraction(sum(ts), len(ts))
        var_enum = Fraction(sum(t * t for t in ts), len(ts)) - e_enum**2
        s1 = sum(scores)
        s2 = sum(s * s for s in scores)
        e_closed = Fraction(n * s1, nn)
        var_closed = Fraction(
            n * (nn - n) * (nn * s2 - s1 * s1), nn * nn * (nn - 1)
        )
        assert e_closed == e_enum, trial
        assert var_closed == var_enum, trial


# ---------------------------------------------------------------------------
# SBA fold (orders_sba_forecast)
# ---------------------------------------------------------------------------


def test_sba_fold_matches_python_recurrence():
    """The engines' integer fold == round-half-up exponential smoothing
    with alpha = 1/8 in 1e-3 units, and the SBA deflator is 15/16."""
    rng = random.Random(7)
    for _ in range(25):
        k = rng.randint(2, 40)
        ts = sorted(rng.sample(range(0, 3000), k))
        qs = [rng.randint(1, 120) for _ in range(k)]
        # the fold as both engines run it
        q_st = qs[0] * 1000
        p_st = (ts[1] - ts[0]) * 1000
        t_st = ts[0]
        for t, q in zip(ts[1:], qs[1:]):
            q_st = (q * 1000 + 7 * q_st + 4) // 8
            p_st = ((t - t_st) * 1000 + 7 * p_st + 4) // 8
            t_st = t
        # reference recurrence: new = round_half_up((x*1000 + 7*old)/8)
        q_ref = qs[0] * 1000
        p_ref = (ts[1] - ts[0]) * 1000
        t_ref = ts[0]
        for t, q in zip(ts[1:], qs[1:]):
            num_q = Fraction(q * 1000 + 7 * q_ref, 8)
            num_p = Fraction((t - t_ref) * 1000 + 7 * p_ref, 8)
            q_ref = int(num_q + Fraction(1, 2)) if num_q % 1 != Fraction(1, 2) else int(num_q) + 1
            p_ref = int(num_p + Fraction(1, 2)) if num_p % 1 != Fraction(1, 2) else int(num_p) + 1
            t_ref = t
        assert (q_st, p_st) == (q_ref, p_ref)
        if p_st > 0:
            assert abs(15 * q_st / (16 * p_st)
                       - 0.9375 * (q_st / p_st)) < 1e-12


# ---------------------------------------------------------------------------
# Type-1 order-statistic selection (agg_quartile_dispersion / gastwirth)
# ---------------------------------------------------------------------------


def _type1_from_cells(values, k):
    """min v with cumulative count >= k, from value cells (the engines'
    selection)."""
    cells = {}
    for v in values:
        cells[v] = cells.get(v, 0) + 1
    cum = 0
    for v in sorted(cells):
        cum += cells[v]
        if cum >= k:
            return v
    raise AssertionError("k out of range")


def test_type1_quantile_selection_rule():
    rng = random.Random(99)
    for _ in range(60):
        n = rng.randint(1, 300)
        vals = [rng.randint(1, 50) for _ in range(n)]
        sv = sorted(vals)
        for num, den in ((1, 4), (3, 4), (1, 3), (1, 2), (2, 3)):
            k = (num * n + den - 1) // den  # ceil(num*n/den)
            assert k >= 1
            assert _type1_from_cells(vals, k) == sv[k - 1]
    # the ceil identities used in the SQL
    for n in range(1, 500):
        assert (n + 3) // 4 == -((-n) // 4)
        assert (3 * n + 3) // 4 == -((-3 * n) // 4)
        assert (n + 2) // 3 == -((-n) // 3)
        assert (n + 1) // 2 == -((-n) // 2)
        assert (2 * n + 2) // 3 == -((-2 * n) // 3)


# ---------------------------------------------------------------------------
# Burstiness identity and sign split (events_gap_burstiness)
# ---------------------------------------------------------------------------


def test_burstiness_identity_and_sign_split():
    """num/den form == (CV^2 - 1)/(CV^2 + 1) with sample variance, and
    the ppb sign split matches truncation-toward-zero on both engines'
    non-negative floor-divisions."""
    rng = random.Random(3)
    for _ in range(40):
        n = rng.randint(2, 50)
        xs = [rng.randint(0, 10000) for _ in range(n)]
        sx = sum(xs)
        if sx == 0:
            continue
        sxx = sum(x * x for x in xs)
        num = n * (n * sxx - sx * sx)
        den = (n - 1) * sx * sx
        # identity: num/den = CV^2 with s^2 = sample variance
        mean = Fraction(sx, n)
        s2 = Fraction(sum((x - mean) ** 2 for x in xs), n - 1)
        cv2 = s2 / (mean * mean)
        assert Fraction(num, den) == cv2
        b = (cv2 - 1) / (cv2 + 1)
        numq, denq = num // (1 << 44), den // (1 << 44)
        if numq >= denq:
            ppb = (10**9 * (numq - denq)) // max(numq + denq, 1)
        else:
            ppb = -((10**9 * (denq - numq)) // max(numq + denq, 1))
        if numq + denq > 10**6:  # quantization headroom
            assert abs(ppb / 1e9 - float(b)) < 1e-4


# ---------------------------------------------------------------------------
# STTR segmentation (text_sttr_segments)
# ---------------------------------------------------------------------------


def test_sttr_segmentation_matches_python():
    rng = random.Random(15)
    vocab = [f"w{i}" for i in range(30)]
    for _ in range(30):
        nw = rng.randint(50, 400)
        words = [rng.choice(vocab) for _ in range(nw)]
        fs = nw // 50
        ttr_sum = sum(
            len(set(words[50 * i: 50 * i + 50])) for i in range(fs)
        )
        # the engines' arithmetic
        ppm = (1000000 * ttr_sum) // (fs * 50)
        mean_ttr = ttr_sum / (fs * 50)
        assert abs(ppm / 1e6 - mean_ttr) < 1e-5
        assert 0 < ppm <= 10**6


# ---------------------------------------------------------------------------
# Tracking signal arithmetic (orders_tracking_signal)
# ---------------------------------------------------------------------------


def test_tracking_signal_ppm_sign_split():
    rng = random.Random(23)
    for _ in range(40):
        k = rng.randint(2, 90)
        ys = [rng.randint(50, 800) for _ in range(k)]
        errs = [b - a for a, b in zip(ys, ys[1:])]
        cum_e = cum_a = 0
        for t, e in enumerate(errs, start=1):
            cum_e += e
            cum_a += abs(e)
            if cum_e >= 0:
                ppm = (1000000 * cum_e * t) // max(cum_a, 1)
            else:
                ppm = -((1000000 * -cum_e * t) // max(cum_a, 1))
            if cum_a > 0:
                ts = cum_e * t / cum_a  # TS = cum_err / (cum_abs / t)
                assert abs(ppm / 1e6 - ts) < 1e-5 * max(1.0, abs(ts))
            else:
                assert ppm == 0
