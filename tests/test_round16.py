"""Round-12-bank (pipeline16) unit pins that don't need a SparkSession.

Pure-python brute-force checks of the derivations both engines share —
the cross-engine probe can't catch identical-bug-in-both-engines (the
agg_siegel_tukey lesson), so every closed form here gets an independent
reference implementation.
"""

import random
from fractions import Fraction


# ---------------------------------------------------------------------------
# Kuiper V from grid cumulatives (agg_kuiper_test)
# ---------------------------------------------------------------------------


def test_kuiper_grid_identity():
    rng = random.Random(16)
    for _ in range(40):
        n1 = rng.randint(1, 80)
        n2 = rng.randint(1, 80)
        xs = [rng.randint(1, 12) for _ in range(n1)]
        ys = [rng.randint(1, 12) for _ in range(n2)]
        # reference: sup over the domain of the signed ECDF differences
        dom = sorted(set(xs) | set(ys))
        dplus = dminus = Fraction(0)
        for v in dom:
            f1 = Fraction(sum(1 for x in xs if x <= v), n1)
            f2 = Fraction(sum(1 for y in ys if y <= v), n2)
            dplus = max(dplus, f1 - f2)
            dminus = max(dminus, f2 - f1)
        v_ref = dplus + dminus
        # engines: integer d(v) = n2*cum1 - n1*cum2 on the shared grid
        best_p = best_m = 0
        c1 = c2 = 0
        for v in dom:
            c1 += sum(1 for x in xs if x == v)
            c2 += sum(1 for y in ys if y == v)
            d = n2 * c1 - n1 * c2
            best_p = max(best_p, d)
            best_m = max(best_m, -d)
        assert Fraction(best_p + best_m, n1 * n2) == v_ref


# ---------------------------------------------------------------------------
# Energy distance via sorted-grid identities (agg_energy_distance)
# ---------------------------------------------------------------------------


def test_energy_distance_grid_identity():
    rng = random.Random(61)
    for _ in range(30):
        n1 = rng.randint(2, 60)
        n2 = rng.randint(2, 60)
        xs = [rng.randint(1, 10) for _ in range(n1)]
        ys = [rng.randint(1, 10) for _ in range(n2)]
        axy_ref = sum(abs(x - y) for x in xs for y in ys)
        sd1_ref = sum(
            abs(a - b) for i, a in enumerate(xs) for b in xs[i + 1:]
        )
        sd2_ref = sum(
            abs(a - b) for i, a in enumerate(ys) for b in ys[i + 1:]
        )
        # grid form
        dom = sorted(set(xs) | set(ys))
        cells = {
            v: (xs.count(v), ys.count(v)) for v in dom
        }
        cb1 = sb1 = cb2 = sb2 = 0
        axy = sd1 = sd2 = 0
        s2t = sum(ys)
        for v in dom:
            c1, c2 = cells[v]
            sa2 = s2t - sb2 - c2 * v
            ca2 = n2 - cb2 - c2
            axy += c1 * ((v * cb2 - sb2) + (sa2 - v * ca2))
            sd1 += c1 * v * (cb1 - (n1 - cb1 - c1))
            sd2 += c2 * v * (cb2 - (n2 - cb2 - c2))
            cb1 += c1
            sb1 += c1 * v
            cb2 += c2
            sb2 += c2 * v
        assert axy == axy_ref
        assert sd1 == sd1_ref
        assert sd2 == sd2_ref
        # E = 2A/(n1n2) - 2sd1/n1^2 - 2sd2/n2^2 >= 0 (Székely's theorem)
        e_scaled = (
            2 * axy * n1 * n2 - 2 * sd1 * n2 * n2 - 2 * sd2 * n1 * n1
        )
        assert e_scaled >= 0


# ---------------------------------------------------------------------------
# Anderson-Darling doubled-mass algebra (agg_anderson_darling)
# ---------------------------------------------------------------------------


def test_anderson_darling_doubling_identities():
    """The doubled masses clear the half-cell corrections exactly:
    N*M_ij - n_i*B_j = (N*M2 - n_i*B2)/2 and
    B_j(N-B_j) - N*c_j/4 = (B2(2N-B2) - N*c_j)/4, and the two samples'
    numerators are exact negatives."""
    rng = random.Random(77)
    for _ in range(40):
        n1 = rng.randint(1, 40)
        n2 = rng.randint(1, 40)
        nn = n1 + n2
        xs = [rng.randint(1, 8) for _ in range(n1)]
        ys = [rng.randint(1, 8) for _ in range(n2)]
        dom = sorted(set(xs) | set(ys))
        p1 = p = 0
        for v in dom:
            c1 = xs.count(v)
            c = c1 + ys.count(v)
            m1 = Fraction(2 * p1 + c1, 2)  # midrank mass, sample 1
            bj = Fraction(2 * p + c, 2)
            m2_ = bj - m1
            b2 = 2 * p + c
            num1 = nn * (2 * p1 + c1) - n1 * b2
            # halved-mass identity
            assert Fraction(num1, 2) == nn * m1 - n1 * bj
            # two-sample antisymmetry
            assert nn * (2 * (p - p1) + (c - c1)) - n2 * b2 == -num1
            # denominator identity
            assert Fraction(b2 * (2 * nn - b2) - nn * c, 4) == bj * (
                nn - bj
            ) - Fraction(nn * c, 4)
            p1 += c1
            p += c


# ---------------------------------------------------------------------------
# Hoover index scaling identity (agg_hoover_index)
# ---------------------------------------------------------------------------


def test_hoover_scaled_identity():
    rng = random.Random(5)
    for _ in range(40):
        n = rng.randint(1, 100)
        xs = [rng.randint(1, 10000) for _ in range(n)]
        s = sum(xs)
        sad = sum(abs(n * x - s) for x in xs)
        mean = Fraction(s, n)
        h_ref = sum(abs(Fraction(x) - mean) for x in xs) / (2 * s)
        assert Fraction(sad, 2 * n * s) == h_ref
        ppb = (10**9 * sad) // (2 * n * s)
        assert 0 <= ppb <= 10**9


# ---------------------------------------------------------------------------
# Fleiss' kappa closed form (agg_fleiss_kappa)
# ---------------------------------------------------------------------------


def test_fleiss_kappa_closed_form():
    rng = random.Random(4)
    m = 4
    for _ in range(40):
        items = []
        for _ in range(rng.randint(2, 60)):
            counts = [0, 0, 0]
            for _ in range(m):
                counts[rng.randint(0, 2)] += 1
            items.append(counts)
        i = len(items)
        # textbook definition with Fractions
        p_bar = Fraction(
            sum(sum(c * c for c in it) - m for it in items),
            i * m * (m - 1),
        )
        tc = [sum(it[j] for it in items) for j in range(3)]
        p_e = sum(Fraction(t, i * m) ** 2 for t in tc)
        # closed form used by the engines
        sa = sum(sum(c * c for c in it) for it in items)
        sb = sum(t * t for t in tc)
        assert p_bar == Fraction(sa - 4 * i, 12 * i)
        assert p_e == Fraction(sb, 16 * i * i)
        num = 4 * i * (sa - 4 * i) - 3 * sb
        den = 3 * (16 * i * i - sb)
        if p_e != 1:
            assert Fraction(num, den) == (p_bar - p_e) / (1 - p_e)


# ---------------------------------------------------------------------------
# Bowker fold: signed unordered pairs (agg_bowker_symmetry)
# ---------------------------------------------------------------------------


def test_bowker_signed_fold():
    rng = random.Random(9)
    cats = list("ABCDE")
    for _ in range(30):
        obs = [
            (rng.choice(cats), rng.choice(cats)) for _ in range(200)
        ]
        # direct contingency
        cnt = {}
        for f, l in obs:
            cnt[(f, l)] = cnt.get((f, l), 0) + 1
        chi_ref = Fraction(0)
        for i, a in enumerate(cats):
            for b in cats[i + 1:]:
                nij = cnt.get((a, b), 0)
                nji = cnt.get((b, a), 0)
                if nij + nji:
                    chi_ref += Fraction((nij - nji) ** 2, nij + nji)
        # signed fold
        pairs = {}
        for f, l in obs:
            if f == l:
                continue
            k = (min(f, l), max(f, l))
            tot, net = pairs.get(k, (0, 0))
            pairs[k] = (tot + 1, net + (1 if f < l else -1))
        chi_fold = sum(
            Fraction(net * net, tot) for tot, net in pairs.values()
        )
        assert chi_fold == chi_ref


# ---------------------------------------------------------------------------
# One-way ANOVA decomposition (agg_oneway_anova)
# ---------------------------------------------------------------------------


def test_anova_decomposition():
    rng = random.Random(11)
    for _ in range(30):
        groups = [
            [rng.randint(0, 500) for _ in range(rng.randint(2, 40))]
            for _ in range(rng.randint(2, 6))
        ]
        allx = [x for g in groups for x in g]
        n = len(allx)
        gm = Fraction(sum(allx), n)
        ssb_ref = sum(
            len(g) * (Fraction(sum(g), len(g)) - gm) ** 2 for g in groups
        )
        ssw_ref = sum(
            sum((Fraction(x) - Fraction(sum(g), len(g))) ** 2 for x in g)
            for g in groups
        )
        # moment form (exact rationals)
        sgq = sum(Fraction(sum(g) ** 2, len(g)) for g in groups)
        s = sum(allx)
        q = sum(x * x for x in allx)
        assert sgq - Fraction(s * s, n) == ssb_ref
        assert q - sgq == ssw_ref
        # floor-quantized engine form is within k+1 of exact
        sgq_i = sum((sum(g) ** 2) // len(g) for g in groups)
        ssb_i = max(sgq_i - (s * s) // n, 0)
        assert abs(ssb_i - ssb_ref) <= len(groups) + 1


# ---------------------------------------------------------------------------
# HITS integer normalization (graph_hits_scores)
# ---------------------------------------------------------------------------


def test_hits_integer_power_iteration():
    """The integer fold tracks the true L-inf-normalized power iteration:
    top hub/authority agree with a float reference on a random weighted
    digraph, and fixed-point values stay in [0, SCALE]."""
    rng = random.Random(8)
    scale = 1_000_000
    for _ in range(20):
        n = rng.randint(3, 10)
        w = {}
        for i in range(n):
            for j in range(n):
                if i != j and rng.random() < 0.6:
                    w[(i, j)] = rng.randint(1, 50)
        if not w:
            continue
        a_i = [scale] * n
        a_f = [1.0] * n
        for _ in range(4):
            h_raw = [
                sum(w.get((i, j), 0) * a_i[j] for j in range(n))
                for i in range(n)
            ]
            mx = max(max(h_raw), 1)
            h_i = [(scale * s) // mx for s in h_raw]
            hf = [
                sum(w.get((i, j), 0) * a_f[j] for j in range(n))
                for i in range(n)
            ]
            mf = max(max(hf), 1e-30)
            h_f = [s / mf for s in hf]
            a_raw = [
                sum(w.get((i, j), 0) * h_i[i] for i in range(n))
                for j in range(n)
            ]
            mx = max(max(a_raw), 1)
            a_i = [(scale * s) // mx for s in a_raw]
            af = [
                sum(w.get((i, j), 0) * h_f[i] for i in range(n))
                for j in range(n)
            ]
            mf = max(max(af), 1e-30)
            a_f = [s / mf for s in af]
        assert all(0 <= x <= scale for x in a_i + h_i)
        for int_v, flt_v in ((a_i, a_f), (h_i, h_f)):
            for iv, fv in zip(int_v, flt_v):
                assert abs(iv / scale - fv) < 1e-3


# ---------------------------------------------------------------------------
# Cohen's d / Hedges' g moments (agg_cohens_d)
# ---------------------------------------------------------------------------


def test_cohens_d_pooled_variance_moments():
    rng = random.Random(21)
    for _ in range(30):
        xs = [rng.randint(0, 900) for _ in range(rng.randint(2, 60))]
        ys = [rng.randint(0, 900) for _ in range(rng.randint(2, 60))]
        n1, n2 = len(xs), len(ys)
        s1, s2 = sum(xs), sum(ys)
        q1 = sum(x * x for x in xs)
        q2 = sum(y * y for y in ys)
        ssq_ref = sum((Fraction(x) - Fraction(s1, n1)) ** 2 for x in xs)
        ssq_ref += sum((Fraction(y) - Fraction(s2, n2)) ** 2 for y in ys)
        exact = (q1 - Fraction(s1 * s1, n1)) + (q2 - Fraction(s2 * s2, n2))
        assert exact == ssq_ref
        var_q = ((q1 - (s1 * s1) // n1) + (q2 - (s2 * s2) // n2)) // (
            n1 + n2 - 2
        )
        var_ref = ssq_ref / (n1 + n2 - 2)
        assert abs(var_q - var_ref) <= 2
        # Hedges J factor matches the textbook form
        df = n1 + n2 - 2
        assert abs((1 - 3 / (4 * df - 1)) - (1 - 3.0 / (4.0 * df - 1.0))) == 0


# ---------------------------------------------------------------------------
# Gamma / Somers' D 2D suffix factorization (agg_goodman_kruskal_gamma)
# ---------------------------------------------------------------------------


def test_gamma_grid_factorization_bruteforce():
    rng = random.Random(31)
    for _ in range(25):
        n = rng.randint(2, 120)
        pts = [(rng.randint(1, 6), rng.randint(1, 4)) for _ in range(n)]
        c_ref = d_ref = ty_ref = 0
        for i in range(n):
            for j in range(i + 1, n):
                (x1, y1), (x2, y2) = pts[i], pts[j]
                if (x1 - x2) * (y1 - y2) > 0:
                    c_ref += 1
                elif (x1 - x2) * (y1 - y2) < 0:
                    d_ref += 1
                elif y1 == y2 and x1 != x2:
                    ty_ref += 1
        # grid form: per cell, strictly-greater-in-both / greater-x-less-y
        cells = {}
        for p in pts:
            cells[p] = cells.get(p, 0) + 1
        cc = dd = 0
        for (x, y), c in cells.items():
            g = sum(
                c2 for (x2, y2), c2 in cells.items() if x2 > x and y2 > y
            )
            h = sum(
                c2 for (x2, y2), c2 in cells.items() if x2 > x and y2 < y
            )
            cc += c * g
            dd += c * h
        assert (cc, dd) == (c_ref, d_ref)
        # Y-tie count from marginals
        my = {}
        for (x, y), c in cells.items():
            my[y] = my.get(y, 0) + c
        ty2 = sum(m * m for m in my.values()) - sum(
            c * c for c in cells.values()
        )
        assert ty2 // 2 == ty_ref


# ---------------------------------------------------------------------------
# MATTR strided windows (text_mattr)
# ---------------------------------------------------------------------------


def test_mattr_strided_windows():
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(20)]
    for _ in range(30):
        nw = rng.randint(50, 400)
        words = [rng.choice(vocab) for _ in range(nw)]
        n_win = (nw - 50) // 10 + 1
        ttr_sum = sum(
            len(set(words[10 * i: 10 * i + 50])) for i in range(n_win)
        )
        ppm = (1000000 * ttr_sum) // (n_win * 50)
        assert abs(ppm / 1e6 - ttr_sum / (n_win * 50)) < 1e-5
        assert 0 < ppm <= 10**6


# ---------------------------------------------------------------------------
# Gries DP cross-multiplied identity (text_gries_dp)
# ---------------------------------------------------------------------------


def test_gries_dp_cross_multiplication():
    rng = random.Random(51)
    for _ in range(40):
        k = rng.randint(2, 6)
        sizes = [rng.randint(100, 5000) for _ in range(k)]
        big_s = sum(sizes)
        f = rng.randint(1, 200)
        # split f across parts
        vs = [0] * k
        for _ in range(f):
            vs[rng.randrange(k)] += 1
        dp_ref = (
            sum(
                abs(Fraction(v, f) - Fraction(s, big_s))
                for v, s in zip(vs, sizes)
            )
            / 2
        )
        sad = sum(abs(v * big_s - s * f) for v, s in zip(vs, sizes))
        assert Fraction(sad, 2 * f * big_s) == dp_ref
        ppb = (500000000 * sad) // (f * big_s)
        assert 0 <= ppb <= 10**9


# ---------------------------------------------------------------------------
# Welch ANOVA quantized pipeline (agg_welch_anova)
# ---------------------------------------------------------------------------


def test_welch_anova_quantized_matches_float():
    rng = random.Random(71)
    for _ in range(25):
        groups = []
        for _ in range(rng.randint(3, 6)):
            n = rng.randint(50, 400)
            base = rng.randint(100, 800)
            groups.append([base + rng.randint(-90, 90) for _ in range(n)])
        # float reference
        k = len(groups)
        w = [
            len(g)
            / (
                sum((x - sum(g) / len(g)) ** 2 for x in g)
                / (len(g) - 1)
            )
            for g in groups
        ]
        ww = sum(w)
        mw = sum(wi * (sum(g) / len(g)) for wi, g in zip(w, groups)) / ww
        num = sum(
            wi * ((sum(g) / len(g)) - mw) ** 2 for wi, g in zip(w, groups)
        ) / (k - 1)
        lam = sum(
            (1 - wi / ww) ** 2 / (len(g) - 1) for wi, g in zip(w, groups)
        )
        f_ref = num / (1 + (2 * (k - 2) / (k * k - 1)) * lam)
        # quantized engine pipeline
        wq = []
        mq = []
        for g in groups:
            n, s = len(g), sum(g)
            q = sum(x * x for x in g)
            wq.append((10**12 * n * n * (n - 1)) // max(n * q - s * s, 1))
            mq.append((10**6 * s) // n)
        wwq = sum(wq)
        mwq = sum(wi * mi for wi, mi in zip(wq, mq)) // wwq
        numq = sum(wi * (mi - mwq) ** 2 for wi, mi in zip(wq, mq)) // 10**12
        lamq = sum(
            (10**9 * (wwq - wi) ** 2) // (wwq * wwq * (len(g) - 1))
            for wi, g in zip(wq, groups)
        )
        f_q = (numq / 1e12 / (k - 1)) / (
            1 + (2 * (k - 2) / (k * k - 1)) * (lamq / 1e9)
        )
        assert abs(f_q - f_ref) < 1e-3 * max(1.0, abs(f_ref))
