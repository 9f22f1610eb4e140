"""Round-11 (pipeline14) unit pins that don't need a SparkSession.

The oracle-parity + bitexact probes cover end-to-end equivalence; these
tests pin the pieces where BOTH engines could share the same bug — pure
derivations that the cross-engine comparison is blind to.
"""


def _st_ranks_bruteforce(n: int) -> list[int]:
    """Reference Siegel-Tukey alternating-extreme rank assignment:
    rank 1 to the minimum; 2,3 to the two maxima; 4,5 to the next two
    minima; ... (positions 1..n, 1 = smallest value)."""
    ranks = [0] * (n + 1)
    lo, hi = 1, n
    r = 1
    take_low, count = True, 1
    while lo <= hi:
        for _ in range(count):
            if lo > hi:
                break
            if take_low:
                ranks[lo] = r
                lo += 1
            else:
                ranks[hi] = r
                hi -= 1
            r += 1
        take_low = not take_low
        count = 2
    return ranks


def _sb(j: int) -> int:
    return j * (j + 1) - (j + 1) // 2


def _stp(j: int) -> int:
    return j * (j + 1) - j // 2


def _bottom_count(n: int) -> int:
    return 2 * (n // 4) + (0 if n % 4 == 0 else 1)


def _g(p: int, n: int) -> int:
    b = _bottom_count(n)
    g = _sb(min(p, b))
    if p > b:
        g += _stp(n - b) - _stp(n - p)
    return g


def test_siegel_tukey_prefix_closed_form_matches_bruteforce():
    """agg_siegel_tukey's G(p) prefix (same algebra in the Spark expr and
    the DuckDB oracle) must equal the brute-force alternating-rank prefix
    for every position at every n. The first draft used B = ceil(n/2)
    bottom-assigned positions and was wrong for n % 4 != 0 — IDENTICALLY
    in both engines, so the bitexact probe stayed green. This pin is the
    only guard for that failure class."""
    for n in range(1, 300):
        ranks = _st_ranks_bruteforce(n)
        assert sorted(ranks[1:]) == list(range(1, n + 1))
        prefix = 0
        for p in range(1, n + 1):
            prefix += ranks[p]
            assert _g(p, n) == prefix, (n, p)


def test_siegel_tukey_rank_sum_identity():
    """Full-statistic cross-check on a deterministic small sample: the
    domain-grid block-sum route must reproduce the per-item midrank sum."""
    vals = [(i * 7919) % 9 + 1 for i in range(257)]
    grp = [(i * 104729) % 2 for i in range(257)]
    n = len(vals)
    order = sorted(range(n), key=lambda i: vals[i])
    ranks = _st_ranks_bruteforce(n)
    from collections import defaultdict

    positions = defaultdict(list)
    for pos, idx in enumerate(order, start=1):
        positions[vals[idx]].append(pos)
    mid2 = {
        v: 2 * sum(ranks[p] for p in ps) / len(ps)
        for v, ps in positions.items()
    }
    w2_ref = sum(mid2[vals[i]] for i in range(n) if grp[i] == 1)

    cells = defaultdict(lambda: [0, 0])
    for i in range(n):
        cells[vals[i]][0] += grp[i]
        cells[vals[i]][1] += 1
    tq = 0
    lo0 = 0
    for v in sorted(cells):
        n1, c = cells[v]
        block = _g(lo0 + c, n) - _g(lo0, n)
        tq += (2_000_000 * n1 * block) // c
        lo0 += c
    w2_query = tq // 1_000_000 + (tq % 1_000_000) / 1_000_000
    assert abs(w2_query - w2_ref) < 1e-3


def test_wav_header_roundtrip():
    """multimodal_wav_header_parse's parser against a handbuilt canonical
    44-byte header (golden bytes, not the query's own constructor)."""
    import struct

    from mongodb_nats_connector_spark.operators.multimodal import (
        sniff_wav_meta,
    )

    rate, channels, bits, frames = 22050, 2, 16, 1000
    block = channels * bits // 8
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + frames * block)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block,
                      block, bits)
        + b"data"
        + struct.pack("<I", frames * block)
    )
    assert len(hdr) == 44
    meta = sniff_wav_meta(hdr)
    assert meta == (rate, channels, bits, rate * block, block,
                    frames * block)
    assert sniff_wav_meta(b"RIFFxxxxNOPE") is None
    assert sniff_wav_meta(b"") is None


def test_image_header_golden_bytes():
    """multimodal_image_header_parse relies on sniff_image_dims for all
    three containers; pin each against handbuilt golden headers."""
    import struct

    from mongodb_nats_connector_spark.operators.multimodal import (
        sniff_image_dims,
    )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
    )
    assert sniff_image_dims(png) == (640, 480, "png")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    assert sniff_image_dims(gif) == (320, 200, "gif")
    jpeg = (
        b"\xff\xd8\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", 1080, 1920)
        + b"\x00"
    )
    assert sniff_image_dims(jpeg) == (1920, 1080, "jpeg")


def test_wav_degenerate_header_yields_null_not_crash():
    """A magic-valid WAV header with block_align = 0 must produce a NULL
    metadata row (typed miss), never a ZeroDivisionError in the task."""
    import struct

    import pandas as pd

    from mongodb_nats_connector_spark.operators.multimodal import (
        _wav_meta_batches,
    )

    bad = (
        b"RIFF"
        + struct.pack("<I", 36)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 0, 0, 0, 0, 16)
        + b"data"
        + struct.pack("<I", 0)
    )
    pdf = pd.DataFrame({"doc_id": [1], "payload": [bad]})
    out = pd.concat(list(_wav_meta_batches(iter([pdf]))))
    assert len(out) == 1
    assert out["sample_rate"].isna().all()


def test_winnowing_short_doc_yields_zero_grams(spark):
    """Documents with fewer than 5 words must contribute ZERO shingles —
    the first draft's sequence(0, -1) descended and crashed slice()."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "one two three"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    arr = df.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "").alias(
            "a"
        ),
    )
    g = arr.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("a") >= 5, F.sequence(F.lit(0), F.size("a") - 5)
            ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
        ).alias("pos", "i"),
    )
    rows = g.groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in rows}
    assert 1 not in counts
    assert counts[2] == 2
