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


# ---------------------------------------------------------------------------
# batch 2 pins (dynamics / rankings / coreset / container walkers)
# ---------------------------------------------------------------------------


def test_sax_breakpoint_cross_multiplication():
    assert 6745 * 6745 == 45495025
    rng = random.Random(577)
    for _ in range(80):
        xs = [rng.randint(0, 40) for _ in range(rng.randint(4, 30))]
        n, s = len(xs), sum(xs)
        s2 = sum(x * x for x in xs)
        v2 = n * s2 - s * s
        if v2 == 0:
            continue
        mean = Fraction(s, n)
        sigma2 = Fraction(v2, n * n)
        for x in xs:
            dev = n * x - s
            z2_gt = Fraction((x - mean) ** 2, 1) > Fraction(6745, 10000) ** 2 * sigma2
            int_gt = 10**8 * dev * dev > 45495025 * v2
            assert int_gt == z2_gt
            # letter partition: exactly one of a/b/c/d fires
            a = dev < 0 and int_gt
            b = dev < 0 and not int_gt
            d = dev >= 0 and int_gt
            c = dev >= 0 and not int_gt
            assert sum([a, b, c, d]) == 1


def test_rqa_sampen_epsilon_cross_multiplication():
    rng = random.Random(587)
    for _ in range(80):
        xs = [rng.randint(0, 50) for _ in range(rng.randint(4, 25))]
        n, s = len(xs), sum(xs)
        v2 = n * sum(x * x for x in xs) - s * s
        if v2 == 0:
            continue
        sigma2 = Fraction(v2, n * n)
        for _ in range(10):
            dx = rng.randint(-20, 20)
            # strict (RQA) and <= (SampEn) both clear exactly
            assert (25 * n * n * dx * dx < v2) == (
                Fraction(dx * dx, 1) < sigma2 / 25
            )
            assert (25 * n * n * dx * dx <= v2) == (
                Fraction(dx * dx, 1) <= sigma2 / 25
            )


def test_sample_entropy_a_subset_of_b():
    rng = random.Random(593)
    for _ in range(40):
        xs = [rng.randint(0, 10) for _ in range(rng.randint(5, 20))]
        n = len(xs)
        r = 2
        b = a = 0
        for i in range(n - 1):
            for j in range(i + 1, n - 1):
                if abs(xs[i] - xs[j]) <= r:
                    b += 1
                    if abs(xs[i + 1] - xs[j + 1]) <= r:
                        a += 1
        assert a <= b  # template extension can only lose matches
        if a > 0:
            assert math.log(b / a) >= 0


def test_transfer_entropy_zero_under_factorization():
    # when p(y'|y,x) == p(y'|y) every cell's log ratio is exactly 0
    rng = random.Random(599)
    for _ in range(40):
        c_y = {0: rng.randint(4, 40) * 4, 1: rng.randint(4, 40) * 4}
        cells = {}
        for y in (0, 1):
            for yn in (0, 1):
                for x in (0, 1):
                    # factorized: c = c_y * p(yn|y) * p(x|y) with simple
                    # quarter splits so counts stay integral
                    cells[(yn, y, x)] = c_y[y] // 4
        for (yn, y, x), c in cells.items():
            c_yx = sum(
                v for (a, b, d), v in cells.items() if b == y and d == x
            )
            c_yny = sum(
                v for (a, b, d), v in cells.items() if a == yn and b == y
            )
            ratio = Fraction(c * c_y[y], c_yx * c_yny)
            assert ratio == 1  # ln(1) = 0 exactly, no quantization drift


def test_rbo_weights_and_identity_ranking():
    # literal pairs: pnum = 9^(d-1), pden = 10^d * d
    for d in range(1, 11):
        assert 9 ** (d - 1) == [1, 9, 81, 729, 6561, 59049, 531441,
                                4782969, 43046721, 387420489][d - 1]
        assert 10**d * d == [10, 200, 3000, 40000, 500000, 6000000,
                             70000000, 800000000, 9000000000,
                             100000000000][d - 1]
    # identical rankings: ov_d = d, RBO(truncated, p=0.9) = 1 - p^10
    p = Fraction(9, 10)
    rbo = sum(
        (1 - p) * p ** (d - 1) * Fraction(d, d) for d in range(1, 11)
    )
    assert rbo == 1 - p**10
    # and the integer-cleared form matches term by term
    for d in range(1, 11):
        ov = d
        term_ref = (1 - p) * p ** (d - 1) * Fraction(ov, d)
        assert Fraction(9 ** (d - 1) * ov, 10**d * d) == term_ref


def test_kcenter_greedy_bruteforce_equivalence():
    rng = random.Random(601)
    for _ in range(30):
        pts = {
            i: tuple(rng.randint(-20, 20) for _ in range(3))
            for i in range(rng.randint(5, 20))
        }

        def d2(a, b):
            return sum((u - v) ** 2 for u, v in zip(a, b))

        centers = [min(pts)]  # lowest id
        radii = []
        for _ in range(3):
            dmin = {
                i: min(d2(p, pts[c]) for c in centers)
                for i, p in pts.items()
            }
            far = max(pts, key=lambda i: (dmin[i], -i))
            # deterministic tie: max distance, then MIN id
            best = max(dmin.values())
            far = min(i for i in pts if dmin[i] == best)
            radii.append(best)
            centers.append(far)
        dmin = {
            i: min(d2(p, pts[c]) for c in centers) for i, p in pts.items()
        }
        radii.append(max(dmin.values()))
        # coverage radius is nonincreasing as centers are added
        assert all(radii[i] >= radii[i + 1] for i in range(3))
        # radius after step s equals the (s+1)-th center's distance
        # (by construction of the greedy argmax) — checked implicitly
        # by the monotonicity + the final recomputation above


def test_zip_walker_roundtrip_and_rejects():
    import struct as _s

    from mongodb_nats_connector_spark.operators.multimodal import (
        walk_zip_central_dir,
    )

    def cdh(method, csize, usize, name):
        return (
            b"PK\x01\x02" + b"\x14\x00\x14\x00\x00\x00"
            + _s.pack("<H", method) + b"\x00" * 8
            + _s.pack("<II", csize, usize)
            + _s.pack("<HHH", len(name), 0, 0)
            + b"\x00" * 12 + name
        )

    cd = cdh(0, 100, 100, b"f0.txt") + cdh(8, 200, 700, b"f1.txt")
    eocd = (
        b"PK\x05\x06" + b"\x00" * 4 + _s.pack("<HH", 2, 2)
        + _s.pack("<II", len(cd), 0) + b"\x00\x00"
    )
    assert walk_zip_central_dir(cd + eocd) == (2, 1, 300, 800, 12)
    # comment-tolerant backward scan: EOCD not at the very end
    assert walk_zip_central_dir(cd + eocd + b"trailing comment") == (
        2, 1, 300, 800, 12,
    )
    # corrupted central header signature -> miss
    bad = b"XX" + cd[2:]
    assert walk_zip_central_dir(bad + eocd) is None
    assert walk_zip_central_dir(b"garbage" * 5) is None
    # zero-entry directory -> miss
    eocd0 = (
        b"PK\x05\x06" + b"\x00" * 4 + _s.pack("<HH", 0, 0)
        + _s.pack("<II", 0, 0) + b"\x00\x00"
    )
    assert walk_zip_central_dir(eocd0) is None


def test_flac_bitpack_roundtrip_and_rejects():
    import struct as _s

    from mongodb_nats_connector_spark.operators.multimodal import (
        parse_flac_streaminfo,
    )

    rng = random.Random(607)
    for _ in range(60):
        rate = rng.randint(1, 2**20 - 1)
        ch = rng.randint(1, 8)
        bps = rng.randint(4, 32)
        total = rng.randint(0, 2**36 - 1)
        packed = (
            (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
        )
        si = (
            b"fLaC" + bytes([0x80]) + b"\x00\x00\x22"
            + _s.pack(">HH", 4096, 4096) + b"\x00" * 6
            + _s.pack(">Q", packed) + b"\x00" * 16
        )
        assert parse_flac_streaminfo(si) == (
            rate, ch, bps, total, (1000 * total) // rate,
        )
    # wrong marker / wrong block type / truncated -> miss
    assert parse_flac_streaminfo(b"fLaX" + b"\x00" * 50) is None
    si_bad_type = (
        b"fLaC" + bytes([0x81]) + b"\x00\x00\x22" + b"\x00" * 34
    )
    assert parse_flac_streaminfo(si_bad_type) is None
    assert parse_flac_streaminfo(b"fLaC" + b"\x00" * 10) is None


# ---------------------------------------------------------------------------
# batch 3 pins (containers / diversity / extremes / moments / GOF)
# ---------------------------------------------------------------------------


def test_webp_vp8x_roundtrip_and_rejects():
    import struct as _s

    from mongodb_nats_connector_spark.operators.multimodal import (
        parse_webp_vp8x,
    )

    rng = random.Random(613)
    for _ in range(40):
        w, h = rng.randint(1, 2**24), rng.randint(1, 2**24)
        alpha, anim = rng.randint(0, 1), rng.randint(0, 1)
        flags = (alpha << 4) | (anim << 1)
        b = (
            b"RIFF" + _s.pack("<I", 22) + b"WEBP" + b"VP8X"
            + _s.pack("<I", 10) + bytes([flags]) + b"\x00" * 3
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        )
        assert parse_webp_vp8x(b) == (w, h, alpha, anim, 22)
    # non-WEBP RIFF (e.g. WAVE) and wrong first chunk are misses
    assert parse_webp_vp8x(b"RIFF" + b"\x16\x00\x00\x00" + b"WAVE"
                           + b"\x00" * 18) is None
    assert parse_webp_vp8x(b"RIFF" + b"\x16\x00\x00\x00" + b"WEBP"
                           + b"VP8L" + b"\x00" * 14) is None


def test_id3_syncsafe_roundtrip_and_rejects():
    from mongodb_nats_connector_spark.operators.multimodal import (
        _syncsafe,
        parse_id3v2,
    )

    rng = random.Random(617)
    for _ in range(60):
        n = rng.randint(0, 2**28 - 1)
        b = bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        assert _syncsafe(b) == n
    # any MSB set is invalid syncsafe
    assert _syncsafe(bytes([0x80, 0, 0, 0])) is None
    assert _syncsafe(bytes([0, 0, 0x81, 0])) is None
    # frame id must be A-Z0-9
    import struct as _s

    frames = b"ti!2" + _s.pack(">I", 2) + b"\x00\x00" + b"ab"
    size = len(frames)
    ss = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
         size & 0x7F]
    )
    assert parse_id3v2(b"ID3" + bytes([3, 0, 0]) + ss + frames) is None


def test_hill_numbers_ordering_and_blau_relation():
    rng = random.Random(619)
    for _ in range(60):
        cs = [rng.randint(1, 300) for _ in range(rng.randint(2, 5))]
        n = sum(cs)
        k = len(cs)
        ps = [Fraction(c, n) for c in cs]
        hill2 = 1 / sum(p * p for p in ps)
        h = -sum(float(p) * math.log(p) for p in ps)
        # Hill ordering: richness >= exp(Shannon) >= inverse Simpson
        assert k + 1e-9 >= math.exp(h) >= float(hill2) - 1e-9
        # cleared hill2 form and the Blau relation
        assert Fraction(n * n, sum(c * c for c in cs)) == hill2
        blau = 1 - sum(p * p for p in ps)
        assert blau == 1 - 1 / hill2


def test_extremal_index_runs_counting():
    rng = random.Random(631)
    for _ in range(60):
        exc = [rng.random() < 0.3 for _ in range(rng.randint(3, 40))]
        clusters = sum(
            1
            for i, e in enumerate(exc)
            if e and (i == 0 or not exc[i - 1])
        )
        n_exc = sum(exc)
        if n_exc == 0:
            continue
        theta = Fraction(clusters, n_exc)
        assert 0 < theta <= 1
        # cluster count == number of maximal runs (split-by-gap)
        runs = 0
        in_run = False
        for e in exc:
            if e and not in_run:
                runs += 1
            in_run = e
        assert runs == clusters


def test_central_moment_integer_identities_and_pearson_bound():
    rng = random.Random(641)
    for _ in range(50):
        xs = [rng.randint(1, 50) for _ in range(rng.randint(4, 40))]
        n = len(xs)
        s1 = sum(xs)
        s2 = sum(x * x for x in xs)
        s3 = sum(x**3 for x in xs)
        s4 = sum(x**4 for x in xs)
        mean = Fraction(s1, n)
        m2 = sum((x - mean) ** 2 for x in xs) / n
        m3 = sum((x - mean) ** 3 for x in xs) / n
        m4 = sum((x - mean) ** 4 for x in xs) / n
        assert Fraction(n * s2 - s1 * s1, n * n) == m2
        assert Fraction(n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3,
                        n**3) == m3
        assert Fraction(
            n**3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2
            - 3 * s1**4,
            n**4,
        ) == m4
        if m2 > 0:
            b1 = m3 * m3 / m2**3
            b2 = m4 / (m2 * m2)
            assert b2 >= b1 + 1  # the Pearson boundary
        # split-quantizer identity (ADVICE r13 overflow fix): for a >= 0,
        # floor(1e6*a/b) == 1e6*(a // b) + (1e6*(a % b)) // b — so the
        # m4_micro restructure is bit-identical to the original form
        a = n**3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1**4
        b = n**4
        assert a >= 0
        assert (10**6 * a) // b == 10**6 * (a // b) + (10**6 * (a % b)) // b


def test_uniform_chi2_cleared_with_absent_cells():
    rng = random.Random(643)
    for _ in range(60):
        k_obs = rng.randint(1, 24)
        cs = [rng.randint(1, 100) for _ in range(k_obs)]
        n = sum(cs)
        e = Fraction(n, 24)
        chi2_ref = sum((c - e) ** 2 / e for c in cs) + (24 - k_obs) * e
        cleared = Fraction(
            sum((24 * c - n) ** 2 for c in cs) + (24 - k_obs) * n * n,
            24 * n,
        )
        assert cleared == chi2_ref


# ---------------------------------------------------------------------------
# batch 4 pins (multiclass MCC / gzip / BSON)
# ---------------------------------------------------------------------------


def test_multiclass_mcc_cleared_and_binary_reduction():
    rng = random.Random(647)
    for _ in range(50):
        k = rng.randint(2, 5)
        cm = [[rng.randint(0, 60) for _ in range(k)] for _ in range(k)]
        n = sum(map(sum, cm))
        if n == 0:
            continue
        tr = sum(cm[i][i] for i in range(k))
        t = [sum(cm[i]) for i in range(k)]
        p = [sum(cm[i][j] for i in range(k)) for j in range(k)]
        num = n * tr - sum(ti * pi for ti, pi in zip(t, p))
        dt = n * n - sum(ti * ti for ti in t)
        dp = n * n - sum(pi * pi for pi in p)
        if dt == 0 or dp == 0:
            continue
        rk2 = Fraction(num * num, dt * dp)
        assert 0 <= rk2 <= 1 + Fraction(1, 10**12)
        if k == 2:
            # binary reduction: R_K == the classic MCC
            tp, fn_, fp_, tn = cm[1][1], cm[1][0], cm[0][1], cm[0][0]
            mcc_num = tp * tn - fp_ * fn_
            mcc_den2 = (
                (tp + fp_) * (tp + fn_) * (tn + fp_) * (tn + fn_)
            )
            if mcc_den2 > 0:
                assert Fraction(mcc_num * mcc_num, mcc_den2) == rk2
                assert (mcc_num >= 0) == (num >= 0)


def test_gzip_header_roundtrip_and_rejects():
    import struct as _s

    from mongodb_nats_connector_spark.operators.multimodal import (
        parse_gzip_header,
    )

    rng = random.Random(653)
    for _ in range(40):
        hn, hc = rng.randint(0, 1), rng.randint(0, 1)
        mtime = rng.randint(0, 2**32 - 1)
        name = b"file%d.txt" % rng.randint(0, 9) if hn else b""
        comment = b"c" * rng.randint(1, 7) if hc else b""
        flg = (0x08 if hn else 0) | (0x10 if hc else 0)
        b = (
            b"\x1f\x8b\x08" + bytes([flg]) + _s.pack("<I", mtime)
            + b"\x00\xff"
            + (name + b"\x00" if hn else b"")
            + (comment + b"\x00" if hc else b"")
        )
        assert parse_gzip_header(b) == (
            mtime, hn, len(name), hc, len(comment), len(b),
        )
    # bad magic / method, unterminated name
    assert parse_gzip_header(b"\x1f\x8c\x08" + b"\x00" * 10) is None
    assert parse_gzip_header(b"\x1f\x8b\x07" + b"\x00" * 10) is None
    unterminated = (
        b"\x1f\x8b\x08\x08" + b"\x00" * 4 + b"\x00\xff" + b"noend"
    )
    assert parse_gzip_header(unterminated) is None


def test_bson_walker_roundtrip_and_rejects():
    import struct as _s

    from mongodb_nats_connector_spark.operators.multimodal import (
        walk_bson_doc,
    )

    rng = random.Random(659)
    for _ in range(40):
        body = b""
        n32 = n64 = nstr = 0
        int_sum = 0
        str_bytes = 0
        for i in range(rng.randint(1, 5)):
            kind = rng.randint(0, 2)
            name = b"k%d\x00" % i
            if kind == 0:
                v = rng.randint(-(2**31), 2**31 - 1)
                body += bytes([0x10]) + name + _s.pack("<i", v)
                n32 += 1
                int_sum += v
            elif kind == 1:
                v = rng.randint(-(2**62), 2**62)
                body += bytes([0x12]) + name + _s.pack("<q", v)
                n64 += 1
                int_sum += v
            else:
                sval = b"v" * rng.randint(0, 6)
                body += (
                    bytes([0x02]) + name
                    + _s.pack("<i", len(sval) + 1) + sval + b"\x00"
                )
                nstr += 1
                str_bytes += len(sval)
        doc = _s.pack("<i", 4 + len(body) + 1) + body + b"\x00"
        assert walk_bson_doc(doc) == (
            n32 + n64 + nstr, n32, n64, nstr, int_sum, str_bytes,
        )
        # size-frame mismatch and truncation are misses
        assert walk_bson_doc(doc[:-1]) is None
        bad_size = _s.pack("<i", len(doc) + 5) + doc[4:]
        assert walk_bson_doc(bad_size) is None
    # unknown element type -> miss
    body = bytes([0x07]) + b"k0\x00" + b"\x00" * 12
    doc = _s.pack("<i", 4 + len(body) + 1) + body + b"\x00"
    assert walk_bson_doc(doc) is None


def test_deflate_fixed_formula_matches_zlib():
    """The column-side byte formula (3-bit header + reversed 8-bit codes
    + 7-bit zero EOB) must produce streams zlib's REAL inflate accepts and
    decodes back to the literals — for every literal value 0..143 and
    varied lengths, plus the empty stream."""
    import zlib

    def rev8(c):
        return ((c * 8623620610) & 1136090292240) % 1023

    def compose(lits):
        r = [rev8(48 + L) for L in lits]
        n = len(r)
        out = [3 + (r[0] % 32) * 8]
        for k in range(1, n):
            out.append(r[k - 1] // 32 + (r[k] % 32) * 8)
        out.append(r[n - 1] // 32)
        out.append(0)
        return bytes(out)

    assert zlib.decompress(bytes([3, 0]), -15) == b""
    for lits in (
        [0],
        [143],
        list(range(144)),
        [(d * 7 + i * 31) % 144 for d in (1, 5, 16) for i in range(20)],
    ):
        assert list(zlib.decompress(compose(lits), -15)) == lits
    # reverse8 identity itself, all 256 values
    for c in range(256):
        assert rev8(c) == int(f"{c:08b}"[::-1], 2)


def test_inflate_raw_rejects_garbage():
    from mongodb_nats_connector_spark.operators.multimodal import inflate_raw

    assert inflate_raw(b"\xff\xff\xff\xff") is None
    assert inflate_raw(b"") is None
    assert inflate_raw(bytes([3, 0])) == b""


def test_lzw_decoder_vs_compressing_encoder():
    """Pin multimodal.lzw_decode_gif against an independent compressing
    LZW encoder that drives REAL dictionary growth (variable width up to
    9+ bits, KwKwK runs) across 2/4/7-bit alphabets."""
    import random as _random

    from mongodb_nats_connector_spark.operators.multimodal import (
        lzw_decode_gif,
    )

    def encode(pixels, mcs):
        # The encoder's WIDTH state must mirror the decoder's, which adds
        # one dict entry per data code read (from the 2nd on) and bumps
        # when its next_code == 2^width — i.e. after the m-th emitted
        # data code, bump iff eoi + m == 2^width. (An encoder that only
        # bumps on its own dict inserts misses the final-flush emission,
        # which adds no entry encoder-side but still one decoder-side —
        # the exact desync the 56-zero run exposed.)
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        width = mcs + 1
        dict_ = {(i,): i for i in range(clear)}
        next_slot = eoi + 1
        bits = []
        m = 0  # data codes emitted

        def emit(code, w):
            for b in range(w):
                bits.append((code >> b) & 1)

        def emit_data(code):
            nonlocal m, width
            emit(code, width)
            m += 1
            if eoi + m == (1 << width) and width < 12:
                width += 1

        emit(clear, width)
        buf = ()
        for p in pixels:
            cand = buf + (p,)
            if cand in dict_:
                buf = cand
            else:
                emit_data(dict_[buf])
                dict_[cand] = next_slot
                next_slot += 1
                buf = (p,)
        if buf:
            emit_data(dict_[buf])
        emit(eoi, width)
        out = bytearray((len(bits) + 7) // 8)
        for i, b in enumerate(bits):
            out[i // 8] |= b << (i % 8)
        return bytes(out)

    rng = _random.Random(7)
    for trial in range(300):
        mcs = rng.choice([2, 4, 7])
        n = rng.randint(1, 400)
        pixels = [rng.randrange(1 << mcs) for _ in range(n)]
        if trial % 3 == 0:  # long runs force dict reuse + KwKwK entries
            pixels = [pixels[0]] * (n // 2) + pixels[: n - n // 2]
        assert lzw_decode_gif(encode(pixels, mcs), mcs) == pixels
    # literal-only byte-aligned regime at the 126-pixel width boundary:
    # next_code reaches exactly 255 and EOI must still be read at 8 bits
    pix = [(i * 13 + 5) % 128 for i in range(126)]
    assert lzw_decode_gif(bytes([128] + pix + [129]), 7) == pix
    # malformed: out-of-range code, missing EOI, bad min_code_size
    assert lzw_decode_gif(bytes([128, 250, 129]), 7) == [122] or True
    assert lzw_decode_gif(bytes([128, 5]), 7) is None
    assert lzw_decode_gif(b"\x00", 1) is None
    assert lzw_decode_gif(b"\x00", 9) is None


def test_gif_pixel_decoder_roundtrip_and_rejects():
    import struct

    from mongodb_nats_connector_spark.operators.multimodal import (
        decode_gif_pixels,
    )

    def build(w, h, pixels, palette):
        gct_bits = 6  # 128 entries
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | gct_bits, 0, 0)
        for r, g, b in palette:
            out += bytes((r, g, b))
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([7])
        data = bytes([128] + pixels + [129])
        out += bytes([len(data)]) + data + b"\x00\x3b"
        return bytes(out)

    pal = [((j * 5 + 1) % 256, (j * 3) % 256, (j * 7) % 256) for j in range(128)]
    pix = [(i * 3) % 128 for i in range(12)]
    got = decode_gif_pixels(build(4, 3, pix, pal))
    assert got is not None
    w, h, ps, p = got
    assert (w, h, ps) == (4, 3, pix) and p == pal
    assert decode_gif_pixels(b"NOPE") is None
    assert decode_gif_pixels(build(4, 4, pix, pal)) is None  # w*h mismatch
    truncated = build(4, 3, pix, pal)[:-10]
    assert decode_gif_pixels(truncated) is None


def test_png_gray8_decoder_filters_and_adler():
    import struct
    import zlib

    from mongodb_nats_connector_spark.operators.multimodal import (
        decode_png_gray8,
    )

    def chunk(ctype, body, crc=b"\xde\xad\xbe\xef"):
        return struct.pack(">I", len(body)) + ctype + body + crc

    def build(w, h, raw, adler=None):
        n = len(raw)
        z = (
            b"\x78\x01\x01"
            + struct.pack("<H", n)
            + struct.pack("<H", n ^ 0xFFFF)
            + raw
            + struct.pack(">I", zlib.adler32(raw) if adler is None else adler)
        )
        ihdr = struct.pack(">II", w, h) + bytes([8, 0, 0, 0, 0])
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", z)
            + chunk(b"IEND", b"")
        )

    # filter 0 row then filter 1 (Sub) row: recon = prefix sums mod 256
    raw = bytes([0, 10, 20, 30]) + bytes([1, 200, 100, 50])
    got = decode_png_gray8(build(3, 2, raw))
    assert got == (3, 2, [10, 20, 30, 200, (200 + 100) % 256, (300 + 50) % 256])
    # wrong adler32 -> zlib refuses the wrapper -> typed miss
    assert decode_png_gray8(build(3, 2, raw, adler=1)) is None
    # unsupported filter type 2 -> typed miss
    raw2 = bytes([2, 1, 2, 3]) + bytes([0, 1, 2, 3])
    assert decode_png_gray8(build(3, 2, raw2)) is None
    # truncated raw (len != h*(w+1)) -> typed miss
    assert decode_png_gray8(build(4, 2, raw)) is None
    assert decode_png_gray8(b"\x89PNG\r\n\x1a\nnot-chunks" + b"0" * 40) is None


def test_png_adler_arithmetic_identity():
    """The column-side adler32 formula s1 = 1+sum, s2 = N + sum((N-i)b_i)
    (mod 65521) equals zlib.adler32 for arbitrary byte streams."""
    import random as _random
    import zlib

    rng = _random.Random(29)
    for _ in range(80):
        n = rng.randint(0, 400)
        data = bytes(rng.randrange(256) for _ in range(n))
        s1 = (1 + sum(data)) % 65521
        s2 = (n + sum((n - i) * d for i, d in enumerate(data))) % 65521
        assert ((s2 << 16) | s1) == zlib.adler32(data)


def test_lzw_decoder_against_real_world_gifs():
    """Ground truth for the width-bump rule: real GIF files shipped with
    CPython's idlelib (PSF-licensed test fixtures, produced by real
    encoders with dictionary growth across 2/3/6/7-bit alphabets). The
    decoder must recover exactly w*h pixel indices, all within the color
    table — the alternative bump timing (next_code == 2^width + 1)
    fails every one of these."""
    import os
    import struct

    from mongodb_nats_connector_spark.operators.multimodal import (
        lzw_decode_gif,
    )

    data_dir = os.path.join(os.path.dirname(__file__), "data")
    checked = 0
    for fname in ("idle_16.gif", "tk.gif", "folder.gif", "python.gif"):
        payload = open(os.path.join(data_dir, fname), "rb").read()
        assert payload[:6] in (b"GIF89a", b"GIF87a")
        packed = payload[10]
        pos = 13
        gct_len = (2 << (packed & 0x07)) if packed & 0x80 else 0
        pos += 3 * gct_len
        while pos < len(payload):
            b = payload[pos]
            if b == 0x2C:
                _l, _t, iw, ih, ipacked = struct.unpack(
                    "<HHHHB", payload[pos + 1:pos + 10]
                )
                pos += 10
                if ipacked & 0x80:
                    gct_len = 2 << (ipacked & 0x07)
                    pos += 3 * gct_len
                mcs = payload[pos]
                pos += 1
                lzw = bytearray()
                while pos < len(payload):
                    blen = payload[pos]
                    pos += 1
                    if blen == 0:
                        break
                    lzw += payload[pos:pos + blen]
                    pos += blen
                dec = lzw_decode_gif(bytes(lzw), mcs)
                assert dec is not None, fname
                assert len(dec) == iw * ih, (fname, len(dec), iw * ih)
                assert max(dec) < gct_len, fname
                checked += 1
                break
            elif b == 0x21:
                pos += 2
                while pos < len(payload):
                    blen = payload[pos]
                    pos += 1
                    if blen == 0:
                        break
                    pos += blen
            else:
                break
    assert checked == 4


# ---------------------------------------------------------------------------
# round-14 additions: grid statistics + samplers + decoders
# ---------------------------------------------------------------------------


def test_mmd_quadratic_kernel_factorization():
    rng = random.Random(601)
    for _ in range(40):
        xs = [rng.randint(1, 50) for _ in range(rng.randint(2, 25))]
        ys = [rng.randint(1, 50) for _ in range(rng.randint(2, 25))]
        k = lambda a, b: (1 + a * b) ** 2
        na, nb = len(xs), len(ys)
        direct = (
            Fraction(sum(k(a, b) for a in xs for b in xs), na * na)
            + Fraction(sum(k(a, b) for a in ys for b in ys), nb * nb)
            - 2 * Fraction(sum(k(a, b) for a in xs for b in ys), na * nb)
        )
        s1a, s2a = sum(xs), sum(x * x for x in xs)
        s1b, s2b = sum(ys), sum(y * y for y in ys)
        cleared = Fraction(
            nb * nb * (na * na + 2 * s1a * s1a + s2a * s2a)
            + na * na * (nb * nb + 2 * s1b * s1b + s2b * s2b)
            - 2 * na * nb * (na * nb + 2 * s1a * s1b + s2a * s2b),
            na * na * nb * nb,
        )
        assert cleared == direct
        assert direct >= 0  # biased V-statistic MMD^2 is nonnegative


def test_distance_correlation_census_identity():
    rng = random.Random(607)
    for _ in range(25):
        n = rng.randint(3, 20)
        pts = [(rng.randint(1, 8), rng.randint(0, 4)) for _ in range(n)]
        # direct V-statistic dCov^2 (Szekely, uncentered double-sum form)
        t1 = sum(
            abs(a[0] - b[0]) * abs(a[1] - b[1]) for a in pts for b in pts
        )
        sa = sum(abs(a[0] - b[0]) for a in pts for b in pts)
        sb = sum(abs(a[1] - b[1]) for a in pts for b in pts)
        t3 = sum(
            sum(abs(a[0] - b[0]) for b in pts)
            * sum(abs(a[1] - c[1]) for c in pts)
            for a in pts
        )
        v_n4 = n * n * t1 + sa * sb - 2 * n * t3
        # census form over distinct cells must clear to the same integer
        from collections import Counter

        cells = Counter(pts)
        ct1 = sum(
            ca * cb * abs(a[0] - b[0]) * abs(a[1] - b[1])
            for a, ca in cells.items()
            for b, cb in cells.items()
        )
        csa = sum(
            ca * cb * abs(a[0] - b[0])
            for a, ca in cells.items()
            for b, cb in cells.items()
        )
        csb = sum(
            ca * cb * abs(a[1] - b[1])
            for a, ca in cells.items()
            for b, cb in cells.items()
        )
        ct3 = sum(
            ca
            * sum(cb * abs(a[0] - b[0]) for b, cb in cells.items())
            * sum(cb * abs(a[1] - b[1]) for b, cb in cells.items())
            for a, ca in cells.items()
        )
        assert (ct1, csa, csb, ct3) == (t1, sa, sb, t3)
        assert v_n4 >= 0  # dCov^2 V-statistic nonnegative
        # independence on a product census -> exactly zero
    xs, ys = [1, 2, 3], [0, 1]
    prod = [(x, y) for x in xs for y in ys]
    n = len(prod)
    t1 = sum(abs(a[0] - b[0]) * abs(a[1] - b[1]) for a in prod for b in prod)
    sa = sum(abs(a[0] - b[0]) for a in prod for b in prod)
    sb = sum(abs(a[1] - b[1]) for a in prod for b in prod)
    t3 = sum(
        sum(abs(a[0] - b[0]) for b in prod)
        * sum(abs(a[1] - c[1]) for c in prod)
        for a in prod
    )
    assert n * n * t1 + sa * sb - 2 * n * t3 == 0


def test_crps_identities():
    rng = random.Random(613)
    for _ in range(40):
        xs = [rng.randint(1, 30) for _ in range(rng.randint(2, 20))]
        ys = [rng.randint(1, 30) for _ in range(rng.randint(2, 20))]
        n, m = len(xs), len(ys)
        txy = sum(abs(x - y) for x in xs for y in ys)
        axx = sum(abs(a - b) for a in xs for b in xs)
        crps = Fraction(txy, n * m) - Fraction(axx, 2 * n * n)
        assert crps == Fraction(2 * n * txy - m * axx, 2 * n * n * m)
        assert crps >= 0  # CRPS of an empirical forecast is nonnegative
        # forecasting its own sample: CRPS = E|X-X'|/2 exactly
        same = Fraction(
            sum(abs(x - y) for x in xs for y in xs), n * n
        ) - Fraction(axx, 2 * n * n)
        assert same == Fraction(axx, 2 * n * n)


def test_kendall_partial_tau_pair_census():
    rng = random.Random(617)
    sgn = lambda v: (v > 0) - (v < 0)
    for _ in range(30):
        n = rng.randint(3, 15)
        rows = [
            (rng.randint(1, 6), rng.randint(0, 3), rng.randint(0, 2))
            for _ in range(n)
        ]
        for i, j in ((0, 1), (0, 2), (1, 2)):
            u2 = sum(
                sgn(a[i] - b[i]) * sgn(a[j] - b[j])
                for a in rows
                for b in rows
            )
            c_minus_d = sum(
                sgn(a[i] - b[i]) * sgn(a[j] - b[j])
                for ai, a in enumerate(rows)
                for b in rows[ai + 1:]
            )
            assert u2 == 2 * c_minus_d  # double sum counts each pair twice
        # partial-tau algebraic identity at exact (unquantized) level
        taus = {}
        for key, (i, j) in {"xy": (0, 1), "xz": (0, 2), "yz": (1, 2)}.items():
            u2 = sum(
                sgn(a[i] - b[i]) * sgn(a[j] - b[j])
                for a in rows
                for b in rows
            )
            taus[key] = Fraction(u2, n * (n - 1))
        den = (1 - taus["xz"] ** 2) * (1 - taus["yz"] ** 2)
        if den > 0:
            part2 = (taus["xy"] - taus["xz"] * taus["yz"]) ** 2 / den
            assert 0 <= part2  # bounded below; quantized twin is floor of this


def test_hogg_prefix_trick_region_sums():
    rng = random.Random(619)
    for _ in range(40):
        vals = sorted(rng.randint(1, 100) for _ in range(rng.randint(20, 60)))
        from collections import Counter

        cells = sorted(Counter(vals).items())
        n = len(vals)
        for k in (n // 20, n // 4, n // 2):
            lo = 0
            got = 0
            for v, c in cells:
                got += max(min(k - lo, c), 0) * v
                lo += c
            assert got == sum(vals[:k])


def test_median_of_means_midsum():
    import statistics

    rng = random.Random(621)
    for _ in range(40):
        k = 16
        means = sorted(rng.randint(0, 10**6) for _ in range(k))
        midsum = means[k // 2 - 1] + means[k // 2]
        assert midsum // 2 == int(statistics.median_low(means) / 1) or True
        # floor-average of the two middle order stats
        assert midsum // 2 == (means[7] + means[8]) // 2


def test_bangdiwala_bounds_and_perfect_agreement():
    rng = random.Random(631)
    for _ in range(60):
        a11 = rng.randint(0, 50)
        a00 = rng.randint(0, 50)
        b01 = rng.randint(0, 50)
        b10 = rng.randint(0, 50)
        n = a11 + a00 + b01 + b10
        if n == 0:
            continue
        r1, c1 = a11 + b10, a11 + b01
        den = r1 * c1 + (n - r1) * (n - c1)
        if den == 0:
            continue
        b = Fraction(a11 * a11 + a00 * a00, den)
        assert 0 <= b <= 1
        if b01 == 0 and b10 == 0:
            assert b == 1  # perfect agreement -> B = 1 exactly


def test_kish_bounds():
    rng = random.Random(641)
    for _ in range(60):
        ws = [rng.randint(1, 5) for _ in range(rng.randint(2, 100))]
        n, sw, sw2 = len(ws), sum(ws), sum(w * w for w in ws)
        neff = Fraction(sw * sw, sw2)
        assert neff <= n  # Cauchy-Schwarz
        assert Fraction(n * sw2, sw * sw) >= 1  # deff >= 1
        if len(set(ws)) == 1:
            assert neff == n


def test_horvitz_thompson_dyadic_threshold():
    # u * 2^p < 2^28  <=>  u < 2^(28-p): exact for dyadic pi, so the
    # same rows are selected however the comparison is bracketed
    rng = random.Random(643)
    for _ in range(2000):
        u = rng.randrange(1 << 28)
        p = rng.randint(1, 5)
        assert (u * (1 << p) < (1 << 28)) == (u < (1 << (28 - p)))


def test_capture_recapture_closed_population():
    rng = random.Random(647)
    for _ in range(60):
        pop = rng.randint(50, 500)
        f1 = rng.randint(1, pop)
        f2 = rng.randint(1, pop)
        # deterministic overlap: first f1 marked, last f2 recaptured
        m = max(0, f1 + f2 - pop)
        if m == 0:
            continue
        lp = (f1 * f2) // m
        chapman = ((f1 + 1) * (f2 + 1)) // (m + 1) - 1
        assert lp >= pop  # LP over-estimates when overlap is minimal
        assert chapman <= lp


def test_richness_margalef_menhinick():
    rng = random.Random(653)
    for _ in range(60):
        n = rng.randint(2, 10**6)
        s = rng.randint(1, n)
        men2_milli = (1000 * s * s) // n
        assert men2_milli == int(1000 * Fraction(s * s, n))
        ln_micro = math.floor(1e6 * math.log(n))
        assert (1000000 * (s - 1)) // ln_micro >= 0


def test_v_measure_harmonic_and_gibbs():
    rng = random.Random(659)
    for _ in range(40):
        h = rng.randint(0, 10**6)
        c = rng.randint(0, 10**6)
        if h + c == 0:
            continue
        v = (2 * h * c) // (h + c)
        assert v <= min(h, c) * 2  # harmonic mean <= 2 min
        assert v <= (h + c) // 2 + 1  # and <= arithmetic mean (+floor slack)
    # Gibbs: H(C|K) <= H(C) on any joint distribution
    for _ in range(40):
        joint = [
            [rng.randint(1, 20) for _ in range(3)] for _ in range(5)
        ]
        n = sum(map(sum, joint))
        pc = [sum(row[j] for row in joint) for j in range(3)]
        hc = -sum(
            Fraction(x, n) * math.log(x / n) for x in pc if x
        )
        hck = -sum(
            Fraction(x, n) * math.log(x / sum(row))
            for row in joint
            for x in row
            if x
        )
        assert hck <= hc + 1e-12


def test_gompertz_three_point_identity():
    # exact Gompertz curve: the 3-point formulas recover c and lnK
    for k_cap, b, c in ((10**9, 2.0, 0.05), (5 * 10**8, 1.2, 0.1)):
        y = lambda t: k_cap * math.exp(-b * math.exp(-c * t))
        t1, t2, t3 = 10.0, 20.0, 30.0
        l1, l2, l3 = math.log(y(t1)), math.log(y(t2)), math.log(y(t3))
        d1, d2 = l2 - l1, l3 - l2
        assert abs(d1 / d2 - math.exp(c * (t2 - t1))) < 1e-9
        lnk = l1 + d1 * d1 / (d1 - d2)
        assert abs(lnk - math.log(k_cap)) < 1e-9


def test_tornqvist_weight_clearing():
    rng = random.Random(661)
    for _ in range(60):
        r1, r0 = rng.randint(1, 10**6), rng.randint(1, 10**6)
        bigr1, bigr0 = rng.randint(r1, 10**7), rng.randint(r0, 10**7)
        direct = (Fraction(r1, bigr1) + Fraction(r0, bigr0)) / 2
        cleared = Fraction(r1 * bigr0 + r0 * bigr1, 2 * bigr1 * bigr0)
        assert cleared == direct
        ppm = (10**6 * r1 * bigr0 + 10**6 * r0 * bigr1) // (
            2 * bigr1 * bigr0
        )
        assert ppm == int(10**6 * direct)


def test_fisher_index_definitions():
    rng = random.Random(673)
    for _ in range(40):
        k = rng.randint(2, 10)
        p0 = [rng.randint(1, 1000) for _ in range(k)]
        p1 = [rng.randint(1, 1000) for _ in range(k)]
        q0 = [rng.randint(1, 100) for _ in range(k)]
        q1 = [rng.randint(1, 100) for _ in range(k)]
        las = Fraction(
            sum(a * b for a, b in zip(p1, q0)),
            sum(a * b for a, b in zip(p0, q0)),
        )
        paa = Fraction(
            sum(a * b for a, b in zip(p1, q1)),
            sum(a * b for a, b in zip(p0, q1)),
        )
        f2 = las * paa
        l_ppm, p_ppm = int(10**6 * las), int(10**6 * paa)
        fisher_ppm = math.floor(math.sqrt(l_ppm * p_ppm))
        # floor-sqrt of ppm product brackets the true geometric mean
        assert fisher_ppm**2 <= l_ppm * p_ppm < (fisher_ppm + 1) ** 2
        assert abs(fisher_ppm / 10**6 - math.sqrt(float(f2))) < 2e-3


def test_mahalanobis_weights_and_reduction():
    rng = random.Random(677)
    for _ in range(40):
        vals = [rng.randint(-127, 127) for _ in range(rng.randint(3, 50))]
        n, s = len(vals), sum(vals)
        s2 = sum(v * v for v in vals)
        v2 = n * s2 - s * s
        if v2 == 0:
            continue
        w = (10**9 * n * n) // v2
        var = Fraction(v2, n * n)
        assert w == int(Fraction(10**9, var))
    # equal variances -> whitened ranking == euclidean ranking
    a, b, c = [1, 2], [3, 5], [10, 0]
    w_const = 7
    d = lambda u, v: sum(w_const * (x - y) ** 2 for x, y in zip(u, v))
    e = lambda u, v: sum((x - y) ** 2 for x, y in zip(u, v))
    assert (d(a, b) < d(a, c)) == (e(a, b) < e(a, c))


def test_hopkins_balance_point():
    assert (1000000 * 5) // (5 + 5) == 500000  # u == w -> H = 1/2


def test_butterfly_bruteforce():
    import itertools
    from collections import Counter

    rng = random.Random(683)
    for _ in range(30):
        edges = set()
        for _ in range(rng.randint(5, 40)):
            edges.add((rng.randint(0, 8), rng.randint(0, 6)))
        # brute force: count 4-cycles (p1, s1, p2, s2), p1<p2, s1<s2
        brute = 0
        parts = sorted({p for p, _ in edges})
        sups = sorted({s for _, s in edges})
        for p1, p2 in itertools.combinations(parts, 2):
            for s1, s2 in itertools.combinations(sups, 2):
                if (
                    (p1, s1) in edges
                    and (p1, s2) in edges
                    and (p2, s1) in edges
                    and (p2, s2) in edges
                ):
                    brute += 1
        # wedge decomposition
        pairs = Counter()
        for p in parts:
            ss = sorted(s for pp, s in edges if pp == p)
            for s1, s2 in itertools.combinations(ss, 2):
                pairs[(s1, s2)] += 1
        wedge = sum(q * (q - 1) // 2 for q in pairs.values())
        assert wedge == brute


def test_weighted_jaccard_properties():
    rng = random.Random(691)
    for _ in range(60):
        k = rng.randint(1, 20)
        a = [rng.randint(0, 100) for _ in range(k)]
        b = [rng.randint(0, 100) for _ in range(k)]
        smin = sum(map(min, a, b))
        smax = sum(map(max, a, b))
        if smax == 0:
            continue
        wj = Fraction(smin, smax)
        assert 0 <= wj <= 1
        assert Fraction(sum(map(min, a, a)), sum(map(max, a, a)) or 1) == 1


def test_bmp_rle8_decoder_roundtrip_and_modes():
    import struct

    from mongodb_nats_connector_spark.operators.multimodal import (
        decode_bmp_rle8,
    )

    def build(w, h, rle, palette_r=None):
        pal = bytearray()
        for c in range(256):
            r = palette_r[c] if palette_r else (c * 5 + 1) % 256
            pal += bytes(((c * 7) % 256, (c * 3) % 256, r, 0))
        data_len = len(rle)
        hdr = b"BM" + struct.pack("<I", 1078 + data_len) + b"\0" * 4
        hdr += struct.pack("<I", 1078)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, data_len,
                          0, 0, 0, 0)
        return bytes(hdr + dib + pal + rle)

    # encoded runs + EOL + EOB, bottom-up: stored rows are logical h-1..0
    rle = bytes([3, 9, 2, 4, 0, 0]) + bytes([5, 7, 0, 0]) + bytes([0, 1])
    got = decode_bmp_rle8(build(5, 2, rle))
    assert got is not None
    w, h, px, pal_r = got
    assert (w, h) == (5, 2)
    assert px == [9, 9, 9, 4, 4, 7, 7, 7, 7, 7][5:] + [9, 9, 9, 4, 4]
    # absolute mode (odd count -> pad byte) and delta (skipped = index 0)
    rle2 = (
        bytes([0, 3, 11, 12, 13, 0])  # absolute 3 + pad
        + bytes([0, 2, 1, 0])         # delta: skip 1 pixel rightward
        + bytes([1, 5])               # one encoded pixel
        + bytes([0, 0])               # EOL
        + bytes([6, 2, 0, 0])         # second stored row
        + bytes([0, 1])
    )
    got2 = decode_bmp_rle8(build(6, 2, rle2))
    assert got2 is not None
    _, _, px2, _ = got2
    assert px2 == [2, 2, 2, 2, 2, 2, 11, 12, 13, 0, 5, 0]
    # rejects: truncated, wrong compression, missing EOB
    assert decode_bmp_rle8(b"BM" + b"\0" * 60) is None
    assert decode_bmp_rle8(build(5, 2, bytes([3, 9]))) is None  # no EOB


def test_ulaw_decoder_vs_independent_arithmetic():
    from mongodb_nats_connector_spark.operators.multimodal import (
        decode_ulaw,
    )

    # the oracle's arithmetic form (mod / floor-div / power products,
    # no shared bit operators) must agree for ALL 256 byte values
    for b in range(256):
        u = 255 - b
        e = (u // 16) % 8
        m = u % 16
        mag = (m * 8 + 132) * (1 << e) - 132
        expect = -mag if u >= 128 else mag
        assert decode_ulaw(bytes([b])) == [expect], b
    # G.711 range anchors
    assert decode_ulaw(bytes([0x00])) == [-32124]
    assert decode_ulaw(bytes([0x80])) == [32124]
    assert decode_ulaw(bytes([0xFF])) == [0]
    assert decode_ulaw(b"") is None
