"""Property-based tests (hypothesis): the CDC apply engine and catalog
merge must agree with trivially-correct in-memory reference models for
arbitrary operation sequences — this is the test strategy SURVEY §5
says the reference lacks and we must create.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.streaming.cdc import (
    ENVELOPE_SCHEMA,
    apply_cdc_batch,
    parse_envelopes,
)

ROW_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.IntegerType(), True),
    ]
)

# A change op: (op, key, value); keys from a small pool to force
# collisions, values small ints.
ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(["c", "u", "d"]),
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=12,
)


def reference_apply(state: dict, ops):
    """The obviously-correct model: ordered upsert/delete by key."""
    for op, k, v in ops:
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = v
    return state


def batch_df(spark, ops, start_lsn=0):
    rows = []
    for i, (op, k, v) in enumerate(ops):
        img = json.dumps({"k": k, "v": v})
        rows.append(
            Row(
                op=op,
                before=img if op == "d" else None,
                after=None if op == "d" else img,
                ts_ms=start_lsn + i,
                lsn=start_lsn + i,
                table="t",
            )
        )
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy)
def test_cdc_apply_matches_reference_model(spark, tmp_path_factory, ops):
    cat = SnapshotCatalog(spark, str(tmp_path_factory.mktemp("wh")))
    typed = parse_envelopes(batch_df(spark, ops), ROW_SCHEMA)
    apply_cdc_batch(cat, "t", typed, ["k"])
    got = (
        {r.k: r.v for r in cat.read("t").collect()} if cat.exists("t") else {}
    )
    expected = reference_apply({}, ops)
    assert got == expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy)
def test_cdc_two_batch_split_matches_reference(spark, tmp_path_factory, ops):
    """Any split of the op sequence into two micro-batches converges to
    the same state as one batch (micro-batch boundary invariance)."""
    cut = len(ops) // 2
    cat = SnapshotCatalog(spark, str(tmp_path_factory.mktemp("wh")))
    if ops[:cut]:
        apply_cdc_batch(
            cat, "t", parse_envelopes(batch_df(spark, ops[:cut]), ROW_SCHEMA), ["k"]
        )
    if ops[cut:]:
        apply_cdc_batch(
            cat,
            "t",
            parse_envelopes(batch_df(spark, ops[cut:], start_lsn=100), ROW_SCHEMA),
            ["k"],
        )
    got = (
        {r.k: r.v for r in cat.read("t").collect()} if cat.exists("t") else {}
    )
    assert got == reference_apply({}, ops)


merge_batches = st.lists(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 99)), min_size=1, max_size=5
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=merge_batches)
def test_catalog_merge_matches_dict_upsert(spark, tmp_path_factory, batches):
    cat = SnapshotCatalog(spark, str(tmp_path_factory.mktemp("wh")))
    model: dict[int, int] = {}
    for batch in batches:
        # within one merge batch, last write per key wins in the model;
        # dedupe the batch the same way before merging
        dedup = {}
        for k, v in batch:
            dedup[k] = v
        df = spark.createDataFrame(
            [Row(k=k, v=v) for k, v in dedup.items()],
            "k int, v int",
        )
        cat.merge("t", df, ["k"])
        model.update(dedup)
    got = {r.k: r.v for r in cat.read("t").collect()}
    assert got == model


# ---------------------------------------------------------------------------
# as_of_join vs a brute-force in-memory reference
# ---------------------------------------------------------------------------
asof_events = st.tuples(
    st.lists(  # probes: (key, ts)
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=8
    ),
    st.lists(  # references: (key, ts, val) with unique (key, ts)
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 999)),
        min_size=0,
        max_size=8,
        unique_by=lambda t: (t[0], t[1]),
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=asof_events)
def test_as_of_join_matches_bruteforce(spark, data):
    from konohadataplatform_spark.operators.temporal import as_of_join

    probes, refs = data
    left = spark.createDataFrame(
        [Row(k=k, lts=t, pid=i) for i, (k, t) in enumerate(probes)]
    )
    if refs:
        right = spark.createDataFrame(
            [Row(k=k, rts=t, val=v) for k, t, v in refs]
        )
    else:
        right = spark.createDataFrame([], "k int, rts int, val int")
    out = as_of_join(
        left, right, ["k"], "lts", "rts", ["rts", "val"], suffix="_m"
    ).collect()
    got = {r.pid: (r.rts_m, r.val_m) for r in out}

    expected = {}
    for i, (k, t) in enumerate(probes):
        best = None
        for rk, rt, rv in refs:
            if rk == k and rt <= t and (best is None or rt > best[0]):
                best = (rt, rv)
        expected[i] = best if best else (None, None)
    assert got == expected


def test_as_of_join_forward_matches_bruteforce(spark):
    """Forward as-of: for every probe, the matched right row is exactly
    the min right_ts >= probe ts for that key (brute-force check over
    a deterministic synthetic set)."""
    import itertools
    from konohadataplatform_spark.operators.temporal import as_of_join

    # keys x timestamps grid with gaps; right has sparse irregular ts
    left = [(k, 100 * t + k) for k, t in itertools.product(range(5), range(20))]
    right = [(k, v * 37 % 1900 + k) for k, v in itertools.product(range(5), range(11))]
    l_df = spark.createDataFrame(left, "k int, ts long")
    r_df = spark.createDataFrame(
        [(k, ts, f"r{k}:{ts}") for k, ts in right], "k int, rts long, payload string"
    )
    got = {
        (r.k, r.ts): r.payload
        for r in as_of_join(
            l_df, r_df, ["k"], "ts", "rts", ["payload"],
            suffix="", direction="forward",
        ).collect()
    }
    rmap = {}
    for k, ts in right:
        rmap.setdefault(k, []).append(ts)
    for k, ts in left:
        nxt = min((t for t in rmap[k] if t >= ts), default=None)
        want = f"r{k}:{nxt}" if nxt is not None else None
        assert got[(k, ts)] == want, (k, ts, got[(k, ts)], want)


# ---------------------------------------------------------------------------
# Avro codec properties: the OCF/value/wire encoders must roundtrip ANY
# record the schema admits (the r4 review found spec holes by hand —
# hypothesis keeps the whole encode/decode surface honest).
# ---------------------------------------------------------------------------
import io
import os
import tempfile

from konohadataplatform_spark.sources import avro_py

_INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_PRIM_VALUES = {
    "long": _INT64,
    "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
    "double": st.floats(allow_nan=False),
    "float": st.floats(allow_nan=False, width=32),
    "boolean": st.booleans(),
    "string": st.text(max_size=40),
    "bytes": st.binary(max_size=40),
}


@given(_INT64)
@settings(max_examples=200, deadline=None)
def test_zigzag_long_roundtrip(n):
    buf = io.BytesIO()
    avro_py._write_long(buf, n)
    buf.seek(0)
    assert avro_py._read_long(buf) == n


@st.composite
def _schema_and_rows(draw):
    names = draw(
        st.lists(
            st.sampled_from(list("abcdefgh")), unique=True, min_size=1, max_size=5
        )
    )
    fields = []
    for nm in names:
        t = draw(st.sampled_from(sorted(_PRIM_VALUES)))
        nullable = draw(st.booleans())
        fields.append((nm, t, nullable))
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": nm, "type": (["null", t] if nullable else t)}
            for nm, t, nullable in fields
        ],
    }
    rows = []
    for _ in range(draw(st.integers(min_value=0, max_value=6))):
        row = {}
        for nm, t, nullable in fields:
            if nullable and draw(st.booleans()):
                row[nm] = None
            else:
                row[nm] = draw(_PRIM_VALUES[t])
        rows.append(row)
    return schema, rows


@given(_schema_and_rows())
@settings(max_examples=30, deadline=None)
def test_ocf_roundtrip_property(sr):
    schema, rows = sr
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.avro")
        assert avro_py.write_ocf(path, schema, rows) == len(rows)
        got_schema, got = avro_py.read_ocf(path)
    assert got_schema == schema
    assert got == rows


@given(_schema_and_rows(), st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_confluent_wire_roundtrip_property(sr, schema_id):
    schema, rows = sr
    for row in rows:
        payload = avro_py.encode_confluent(row, schema, schema_id)
        assert payload[0] == avro_py.CONFLUENT_MAGIC
        assert avro_py.confluent_schema_id(payload) == schema_id
        sid, got = avro_py.decode_confluent(payload, {schema_id: schema})
        assert sid == schema_id and got == row


# ---------------------------------------------------------------------------
# SQL MERGE property: for arbitrary target/source key sets, guarded
# matched-updates, NOT-MATCHED inserts, and NOT MATCHED BY SOURCE
# deletes must agree with a trivially-correct dict model. The r4 review
# found hand-testable holes in the WHEN parser; this searches the space.
# ---------------------------------------------------------------------------

_merge_case = st.tuples(
    st.lists(  # target rows: (key, value)
        st.tuples(st.integers(0, 6), st.integers(0, 50)),
        unique_by=lambda t: t[0], min_size=0, max_size=6,
    ),
    st.lists(  # source rows
        st.tuples(st.integers(0, 6), st.integers(0, 50)),
        unique_by=lambda t: t[0], min_size=0, max_size=6,
    ),
    st.integers(0, 50),  # guard threshold for the matched-update
    st.booleans(),       # include NOT MATCHED BY SOURCE DELETE?
)


@given(_merge_case)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_sql_agrees_with_model(spark, tmp_path_factory, case):
    from konohadataplatform_spark.engine import Engine

    tgt, src, guard, with_bysource = case
    base = tmp_path_factory.mktemp("merge_prop")
    engine = Engine(spark, SnapshotCatalog(spark, str(base / "wh")))
    engine.save_table(
        "t",
        spark.createDataFrame(tgt or [(99, 0)], "k long, v long").filter(
            "k >= 0" if tgt else "k < 0"
        ),
    )
    spark.createDataFrame(src or [(99, 0)], "k long, v long").filter(
        "k >= 0" if src else "k < 0"
    ).createOrReplaceTempView("s")
    bysource = "WHEN NOT MATCHED BY SOURCE THEN DELETE" if with_bysource else ""
    engine.sql(
        f"""
        MERGE INTO t USING s ON t.k = s.k
        WHEN MATCHED AND s.v >= {guard} THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        {bysource}
        """
    )
    got = sorted(tuple(r) for r in engine.table("t").collect())

    model = dict(tgt)
    smap = dict(src)
    out = {}
    for k, v in model.items():
        if k in smap:
            out[k] = smap[k] if smap[k] >= guard else v
        elif not with_bysource:
            out[k] = v
    for k, v in smap.items():
        if k not in model:
            out[k] = v
    assert got == sorted(out.items())


# ---------------------------------------------------------------------------
# Image codec properties: PNG must roundtrip ANY pixel buffer exactly;
# JPEG must roundtrip block-constant grayscale exactly (the DC-only
# invariant q_jpeg_decode's oracle relies on) and stay within the DCT
# envelope for arbitrary grayscale.
# ---------------------------------------------------------------------------
from konohadataplatform_spark.operators import jpeg_py
from konohadataplatform_spark.operators import multimodal as MM


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([0, 2, 6]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, color_type, rnd):
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
    img = MM.decode_png(MM.encode_png(w, h, px, color_type))
    assert (img["width"], img["height"], img["channels"]) == (w, h, ch)
    assert img["pixels"] == px


@given(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
    st.randoms(use_true_random=False),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_blockwise_constant_gray_is_exact(bw, bh, rnd):
    """8x8-constant blocks are DC-only: identity-quant grayscale JPEG
    must reproduce them bit-exactly (q_jpeg_decode's oracle contract)."""
    vals = [rnd.randrange(256) for _ in range(bw * bh)]
    w, h = bw * 8, bh * 8
    px = bytes(vals[(y // 8) * bw + (x // 8)] for y in range(h) for x in range(w))
    dec = jpeg_py.decode_jpeg(jpeg_py.encode_jpeg_gray(w, h, px))
    assert dec["pixels"] == px


@given(st.randoms(use_true_random=False))
@settings(max_examples=20, deadline=None)
def test_jpeg_lut_huffman_matches_bit_at_a_time(rnd):
    """r14 optimization guard: the 16-bit-peek LUT decoder and batched
    read_bits must decode random marker-free streams exactly like a
    per-bit canonical tree walk over the same table (the pre-r14
    spelling, inlined here as the reference)."""
    bits, values = jpeg_py.AC_LUM
    lut = jpeg_py._decode_table(bits, values)
    # reference: (length, code) -> value dict walked bit by bit
    ref = {
        (length, code): v
        for v, (code, length) in jpeg_py._canonical_codes(bits, values).items()
    }
    payload = bytes(
        b if b != 0xFF else 0xFE for b in (rnd.randrange(256) for _ in range(400))
    )
    fast = jpeg_py._BitReader(payload)
    slow_bits = []  # reference bit stream (no stuffing/markers present)
    for b in payload:
        slow_bits.extend((b >> i) & 1 for i in range(7, -1, -1))
    sp = 0
    for _ in range(80):
        if sp + 32 > len(slow_bits):
            break  # stop before either reader can exhaust the stream
        got = fast.decode_huff(lut)
        code, length = 0, 0
        while True:
            code = (code << 1) | slow_bits[sp]
            sp += 1
            length += 1
            assert length <= 16, "reference walked past max code length"
            if (length, code) in ref:
                assert ref[(length, code)] == got
                break
        n = rnd.randrange(0, 11)
        want = 0
        for _ in range(n):
            want = (want << 1) | slow_bits[sp]
            sp += 1
        assert fast.read_bits(n) == want


def test_jpeg_overfull_huffman_table_raises():
    """r15 (r14 ADVICE): a DHT whose code count exceeds 2^length
    capacity must raise instead of silently growing the cached LUT
    past its nominal 64K entries."""
    with pytest.raises(jpeg_py.JpegError, match="overfull"):
        jpeg_py._HuffLUT([4] + [0] * 15, [1, 2, 3, 4])
    # a legitimately FULL length-2 table still builds
    assert len(jpeg_py._HuffLUT([0, 4] + [0] * 14, [1, 2, 3, 4]).lut) == 1 << 16


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.randoms(use_true_random=False),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_gray_arbitrary_within_dct_envelope(w, h, rnd):
    """Arbitrary grayscale (any dims, incl. non-multiples of 8) must
    decode within a small integer-rounding envelope of the source."""
    px = bytes(rnd.randrange(256) for _ in range(w * h))
    dec = jpeg_py.decode_jpeg(jpeg_py.encode_jpeg_gray(w, h, px))
    assert (dec["width"], dec["height"]) == (w, h)
    err = max(abs(a - b) for a, b in zip(dec["pixels"], px))
    assert err <= 4, f"gray DCT envelope exceeded: {err}"


@given(_schema_and_rows())
@settings(max_examples=20, deadline=None)
def test_ocf_deflate_roundtrip_property(sr):
    """Spec deflate codec: raw RFC-1951 blocks roundtrip any record
    set and interop with the null-codec reader path."""
    schema, rows = sr
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.avro")
        assert avro_py.write_ocf(path, schema, rows, codec="deflate") == len(rows)
        got_schema, got = avro_py.read_ocf(path)
    assert got_schema == schema
    assert got == rows


from konohadataplatform_spark.operators import gif_py


@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=2, max_value=8),
    st.randoms(use_true_random=False),
)
@settings(max_examples=25, deadline=None)
def test_gif_roundtrip_property(w, h, n_frames, n_colors, rnd):
    """LZW + palette roundtrip for arbitrary dims/frame counts/palette
    sizes (exercises code-width growth and multi-frame framing)."""
    # random RG channels; B = palette index so entries are distinct and
    # the exact-match encode lookup stays 1:1
    pal = bytes(
        v
        for i in range(n_colors)
        for v in (rnd.randrange(256), rnd.randrange(256), i)
    )
    frames = []
    for _ in range(n_frames):
        idx = [rnd.randrange(n_colors) for _ in range(w * h)]
        frames.append(bytes(c for i in idx for c in pal[3 * i : 3 * i + 3]))
    dec = gif_py.decode_gif(gif_py.encode_gif(w, h, frames, palette=pal))
    assert dec["n_frames"] == n_frames
    for k, fr in enumerate(dec["frames"]):
        assert fr["pixels"] == frames[k]


def test_gif_realistic_frame_roundtrip():
    """r15 (r14 VERDICT item 10): a representative-size frame in the
    harness — the r14 LZW-loop rewrite decision was made on 8x4 bench
    fixtures, where per-frame setup dominates and the rewrite measured
    slower; any future LZW optimization must also hold on frames where
    the symbol loop is the cost. 160x120, 64 colors, 2 frames with
    structured content (gradient + tiling) so LZW code-width growth and
    dictionary resets are actually exercised."""
    w, h, n_colors = 160, 120, 64
    pal = bytes(v for i in range(n_colors) for v in (4 * i % 256, 255 - 3 * i % 256, i))
    frames = []
    for k in range(2):
        idx = [((x // 3 + y // 2 + 7 * k) ^ (x * y % 13)) % n_colors
               for y in range(h) for x in range(w)]
        frames.append(bytes(c for i in idx for c in pal[3 * i: 3 * i + 3]))
    dec = gif_py.decode_gif(gif_py.encode_gif(w, h, frames, palette=pal))
    assert dec["n_frames"] == 2
    for k, fr in enumerate(dec["frames"]):
        assert fr["pixels"] == frames[k]


# ---------------------------------------------------------------------------
# Manifest pruning property: scan(t, F) must equal read(t).filter(F)
# for arbitrary predicates over a range-clustered AND a partitioned
# table — pruning may only skip files that cannot matter.
# ---------------------------------------------------------------------------

_SCAN_TABLES: dict = {}


def _scan_fixture(spark, tmp_path_factory):
    key = id(spark)
    if key not in _SCAN_TABLES:
        base = tmp_path_factory.mktemp("scan_prop")
        cat = SnapshotCatalog(spark, str(base / "wh"))
        from pyspark.sql import functions as SF

        df = (
            spark.range(0, 3000)
            .withColumn("v", (SF.col("id") * 7) % 91)
            .withColumn("p", SF.concat(SF.lit("g"), SF.col("id") % 5))
            .repartitionByRange(6, "id")
        )
        cat.write("ranged", df)
        cat.write("parted", df, partition_by=["p"])
        _SCAN_TABLES[key] = cat
    return _SCAN_TABLES[key]


_filter_strategy = st.lists(
    st.tuples(
        st.sampled_from(["id", "v"]),
        st.sampled_from(["=", "<", "<=", ">", ">="]),
        st.integers(min_value=-10, max_value=3100),
    ),
    min_size=1,
    max_size=3,
)


@given(_filter_strategy, st.sampled_from(["ranged", "parted"]), st.booleans())
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_scan_equals_filtered_read(spark, tmp_path_factory, filters, table, add_part):
    cat = _scan_fixture(spark, tmp_path_factory)
    if add_part and table == "parted":
        filters = filters + [("p", "=", "g3")]
    got = sorted(tuple(r) for r in cat.scan(table, filters).collect())
    df = cat.read(table)
    for col, op, val in filters:
        sql_op = "=" if op in ("=", "==") else op
        lit = f"'{val}'" if isinstance(val, str) else str(val)
        df = df.filter(f"{col} {sql_op} {lit}")
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 3]),
    st.booleans(),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_property(w, h, channels, big_endian, rnd):
    """encode_tiff/decode_tiff are exact inverses for any dimensions,
    channel count, and byte order."""
    px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    img = MM.decode_tiff(
        MM.encode_tiff(w, h, px, channels=channels, big_endian=big_endian)
    )
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    assert img["pixels"] == px


# ---------------------------------------------------------------------------
# Retrieval scoring: arbitrary small corpora must match a Python replay
# of the integer BM25 formula exactly (beyond the fixed-fixture test in
# test_retrieval.py — hypothesis explores adversarial shapes: repeated
# words, single-word docs, duplicate docs, all-stopword corpora).
# ---------------------------------------------------------------------------
_words = st.sampled_from(["a", "b", "c", "dd", "ee", "ff"])
_doc = st.lists(_words, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=_corpus)
def test_bm25_matches_python_replay_property(spark, texts):
    from collections import Counter

    from pyspark.sql import functions as F

    from konohadataplatform_spark.operators.retrieval import SCALE, bm25_topk

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id: long, text: string"
    )
    n = 1
    tf = Counter()
    for d, text in enumerate(texts):
        for w in text.strip().split(" "):
            tf[(d, w)] += 1
    dl = Counter()
    for (d, _t), c in tf.items():
        dl[d] += c
    nd, tl = len(dl), sum(dl.values())
    df_ = Counter(t for (_d, t) in tf)
    idf = {t: (nd * SCALE) // c for t, c in df_.items() if c <= nd // 2}
    tf_sat = {
        (d, t): (44 * c * tl * 1000)
        // (20 * c * tl + 6 * tl + 18 * dl[d] * nd)
        for (d, t), c in tf.items()
        if t in idf
    }
    scores = {}
    qdocs = [d for d in dl if d % 2 == 0]
    for q in qdocs:
        qterms = {t: c for (d, t), c in tf.items() if d == q and t in idf}
        for (d, t), s in tf_sat.items():
            if d != q and t in qterms:
                scores[(q, d)] = scores.get((q, d), 0) + qterms[t] * idf[t] * s
    expect = set()
    by_q = {}
    for (q, d), s in scores.items():
        by_q.setdefault(q, []).append((-s, d))
    for q, hits in by_q.items():
        for rank, (neg_s, d) in enumerate(sorted(hits)[:3], start=1):
            expect.add((q, d, -neg_s, rank))
    got = {
        (r.q_id, r.hit_id, r.score, r.hit_rank)
        for r in bm25_topk(
            docs, F.col("doc_id") % 2 == 0, k=3, n=n, df_cap_frac=2
        ).collect()
    }
    assert got == expect


# --------------------------------------------------------------------------
# Round-10 operator properties vs in-memory reference models
# --------------------------------------------------------------------------
texts_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from("ab XY,1.\n"),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_strategy)
def test_normalized_dedup_matches_reference_model(spark, texts):
    import re

    from konohadataplatform_spark.operators.dedup import normalized_dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )

    def norm(t):
        t = re.sub("[0-9]", "0", t.lower())
        t = re.sub("[^a-z0-9 ]", "", t)
        return re.sub(" +", " ", t).strip()

    groups = {}
    for i, t in enumerate(texts):
        groups.setdefault(norm(t), []).append((i, t))
    out = {r.kept_doc_id: r for r in normalized_dedup(docs).collect()}
    assert len(out) == len(groups)
    for members in groups.values():
        kept = min(i for i, _ in members)
        assert out[kept].n_copies == len(members)
        assert out[kept].n_distinct_raw == len({t for _, t in members})


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_strategy, min_docs=st.integers(min_value=2, max_value=4))
def test_boilerplate_strip_matches_reference_model(spark, texts, min_docs):
    from konohadataplatform_spark.operators.text import (
        boilerplate_strip_rewrite,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    # reference: line frequency by distinct doc over non-empty trims
    freq = {}
    for i, t in enumerate(texts):
        for ln in {x.strip() for x in (t or "").split("\n") if x.strip()}:
            freq[ln] = freq.get(ln, 0) + 1
    bp = {ln for ln, c in freq.items() if c >= min_docs}
    out = {r.doc_id: r for r in
           boilerplate_strip_rewrite(docs, min_docs=min_docs).collect()}
    for i, t in enumerate(texts):
        lines = (t or "").split("\n")
        kept = [ln for ln in lines if ln.strip() not in bp or not ln.strip()]
        assert out[i].cleaned_text == "\n".join(kept)
        assert out[i].n_lines == len(lines)
        assert out[i].n_stripped == len(lines) - len(kept)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_strategy)
def test_dup_ngram_mass_bounded_by_nonspace_chars(spark, texts):
    from konohadataplatform_spark.operators.curation import (
        gopher_dup_ngram_flags,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    for r in gopher_dup_ngram_flags(docs).collect():
        for n in range(5, 11):
            m = getattr(r, f"dup{n}_mass")
            assert 0 <= m <= r.nonspace_chars


# --------------------------------------------------------------------------
# r11: ranking_metrics vs a pure-Python reference scorer
# --------------------------------------------------------------------------
def _reference_metrics(ranked, relevant, k):
    """Obviously-correct scorer over (qid -> [(hit, rank)]) and
    (qid -> set(hits)) with the same integer weight tables."""
    from konohadataplatform_spark.operators.evaluation import (
        RANK_SCALE,
        dcg_weight_table,
        idcg_prefix_table,
    )

    w, p = dcg_weight_table(k), idcg_prefix_table(k)
    out = {}
    for qid, hits in ranked.items():
        rel = relevant.get(qid, set())
        in_k = [(h, r) for h, r in hits if r <= k]
        rel_hits = sorted(r for h, r in in_k if h in rel)
        n_rel = len(rel)
        dcg = sum(w[r - 1] for h, r in in_k if h in rel)
        idcg = p[min(n_rel, k) - 1] if n_rel > 0 else 0
        out[qid] = {
            "n_relevant": n_rel,
            "hits_at_k": len(rel_hits),
            "first_rel_rank": rel_hits[0] if rel_hits else 0,
            "recall_micro": (
                len(rel_hits) * RANK_SCALE // n_rel if n_rel else 0
            ),
            "mrr_micro": (
                RANK_SCALE // rel_hits[0] if rel_hits else 0
            ),
            "dcg_micro": dcg,
            "idcg_micro": idcg,
            "ndcg_micro": (
                dcg * RANK_SCALE // idcg if idcg > 0 and rel_hits else 0
            ),
        }
    return out


ranking_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # query id
        st.integers(min_value=10, max_value=25),  # hit id
    ),
    min_size=1,
    max_size=30,
    unique=True,
)
relevant_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=10, max_value=25),
    ),
    max_size=20,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=ranking_strategy, rel=relevant_strategy, k=st.sampled_from([3, 5, 10]))
def test_ranking_metrics_matches_reference_model(spark, pairs, rel, k):
    from konohadataplatform_spark.operators.evaluation import (
        ranking_metrics,
    )

    # assign dense 1-based ranks per query in hit-id order
    ranked_py: dict = {}
    rows = []
    for qid, hit in sorted(pairs):
        r = len(ranked_py.setdefault(qid, [])) + 1
        ranked_py[qid].append((hit, r))
        rows.append((qid, hit, r))
    ranked = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, knn_rank int"
    )
    rel_py: dict = {}
    for qid, hit in rel:
        rel_py.setdefault(qid, set()).add(hit)
    if rel:
        relevant = spark.createDataFrame(
            sorted({(q, h) for q, h in rel}),
            "query_id long, neighbor_id long",
        )
    else:
        relevant = spark.createDataFrame(
            [], "query_id long, neighbor_id long"
        )
    got = {
        row["query_id"]: row.asDict()
        for row in ranking_metrics(ranked, relevant, k=k).collect()
    }
    expected = _reference_metrics(ranked_py, rel_py, k)
    assert set(got) == set(expected)
    for qid, exp in expected.items():
        g = got[qid]
        for key, val in exp.items():
            assert g[key] == val, (qid, key, g[key], val)


# --------------------------------------------------------------------------
# r11: vocab_divergence vs an exact-fractions reference model
# --------------------------------------------------------------------------
docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.lists(
            st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=6
        ),
    ),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy)
def test_vocab_divergence_matches_reference_model(spark, docs):
    from collections import Counter

    from konohadataplatform_spark.operators.text import vocab_divergence

    df = spark.createDataFrame(
        [(i, " ".join(words), grp) for i, (grp, words) in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: r.asDict() for r in vocab_divergence(df).collect()
    }
    by_grp: dict = {}
    for grp, words in docs:
        by_grp.setdefault(grp, Counter()).update(words)
    total = sum(sum(c.values()) for c in by_grp.values())
    for grp, cg in by_grp.items():
        tg = sum(cg.values())
        tr = total - tg
        rest = Counter()
        for g2, c2 in by_grp.items():
            if g2 != grp:
                rest.update(c2)
        if tr == 0:
            assert got[grp]["tvd_micro"] is None
            continue
        num = sum(
            abs(cg.get(w, 0) * tr - rest.get(w, 0) * tg)
            for w in set(cg) | set(rest)
        )
        expected = num * 1_000_000 // (2 * tg * tr)
        assert got[grp]["tvd_micro"] == expected, (grp, docs)
        assert 0 <= expected <= 1_000_000


# ---------------------------------------------------------------------------
# r12: unigram-LM trainer vs a pure-Python reference (full training
# replay: seed -> greedy segment -> usage -> prune -> final segment)
# ---------------------------------------------------------------------------
def _py_unigram(texts, vocab_size=5, L=3, min_usage=2, seed_mult=4):
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.strip().split(" "):
            if w:
                words[w] += 1

    def topk(counter, k):
        items = [(p, u) for p, u in counter.items() if u >= min_usage]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]

    cands = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(2, min(L, len(w) - i) + 1):
                cands[w[i:i + l]] += f
    seed = {p for p, _ in topk(cands, seed_mult * vocab_size)}

    def segment(w, vocab):
        toks, i = [], 0
        while i < len(w):
            for l in range(min(L, len(w) - i), 1, -1):
                if w[i:i + l] in vocab:
                    toks.append(w[i:i + l])
                    i += l
                    break
            else:
                toks.append(w[i])
                i += 1
        return toks

    usage = Counter()
    for w, f in words.items():
        for p in segment(w, seed):
            if len(p) >= 2:
                usage[p] += f
    vocab_items = topk(usage, vocab_size)
    vocab = {p for p, _ in vocab_items}
    return (
        [(r + 1, p, u) for r, (p, u) in enumerate(vocab_items)],
        {w: segment(w, vocab) for w in words},
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=7),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_unigram_train_matches_reference_model(spark, texts):
    from konohadataplatform_spark.operators.bpe import unigram_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab, words = unigram_train(
        docs, vocab_size=5, max_piece_len=3, iters=1, min_usage=2,
        seed_mult=4,
    )
    ref_vocab, ref_segs = _py_unigram(texts)
    got_vocab = [
        (r["piece_rank"], r["piece"], r["usage"])
        for r in vocab.orderBy("piece_rank").collect()
    ]
    assert got_vocab == ref_vocab
    got_segs = {r["word"]: list(r["toks"]) for r in words.collect()}
    assert got_segs == ref_segs


# ---------------------------------------------------------------------------
# r12: url_host vs the stdlib parser on well-formed URLs (independent
# cross-check, not a replay of our own regex)
# ---------------------------------------------------------------------------
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    urls=st.lists(
        st.builds(
            lambda scheme, labels, port, path, query: (
                scheme
                + "://"
                + ".".join(labels)
                + (f":{port}" if port else "")
                + path
                + query
            ),
            st.sampled_from(["http", "https", "HTTP"]),
            st.lists(
                st.text(alphabet="abz09-", min_size=1, max_size=6).filter(
                    lambda s: not s.startswith("-") and not s.endswith("-")
                ),
                min_size=1,
                max_size=3,
            ),
            st.one_of(st.none(), st.integers(min_value=1, max_value=65535)),
            st.sampled_from(["", "/", "/a/b", "/x.html"]),
            st.sampled_from(["", "?q=1", "#frag"]),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_url_host_matches_stdlib_urlsplit(spark, urls):
    from urllib.parse import urlsplit

    from konohadataplatform_spark.operators.curation import url_host

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    got = {
        r["i"]: r["h"]
        for r in df.select("i", url_host(F.col("url")).alias("h")).collect()
    }
    for i, u in enumerate(urls):
        expect = urlsplit(u).hostname or ""
        assert got[i] == expect, (u, got[i], expect)
