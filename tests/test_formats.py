"""Multi-format source tests: CSV/JSON/ORC round-trip the catalog
schemas exactly, and malformed rows quarantine instead of failing."""

from __future__ import annotations

from bigdatacw1_spark.sources.catalog import load_table
from bigdatacw1_spark.sources.formats import (
    quarantine_split,
    read_csv,
    read_jsonl,
    read_orc,
    read_xml,
)
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _events(spark):
    return load_table(spark, SF_SMALL, "events")


def _assert_roundtrip(orig, got):
    assert got.schema == orig.schema
    a = sorted(map(tuple, orig.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b


def test_csv_roundtrip_with_schema(spark, tmp_path):
    orig = _events(spark)
    d = str(tmp_path / "ev_csv")
    (
        orig.write.option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(d)
    )
    good, bad = quarantine_split(read_csv(spark, d, "events"))
    assert bad.count() == 0
    _assert_roundtrip(orig, good)


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    orig = _events(spark)
    d = str(tmp_path / "ev_json")
    orig.write.option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").option(
        "timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).json(d)
    good, bad = quarantine_split(read_jsonl(spark, d, "events"))
    assert bad.count() == 0
    _assert_roundtrip(orig, good)


def test_orc_roundtrip(spark, tmp_path):
    orig = _events(spark)
    d = str(tmp_path / "ev_orc")
    orig.write.orc(d)
    _assert_roundtrip(orig, read_orc(spark, d, "events"))


def test_xml_roundtrip_with_schema(spark, tmp_path):
    """Spark 4 built-in XML source: events round-trip through an XML
    write/read with the declared schema and pinned timestamp formats."""
    orig = _events(spark)
    d = str(tmp_path / "ev_xml")
    (
        orig.write.format("xml")
        .option("rowTag", "row")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .save(d)
    )
    _assert_roundtrip(orig, read_xml(spark, d, "events"))


def test_malformed_json_rows_quarantine(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"event_id": 1, "ts": "2024-01-01 00:00:00.000000", "user_id": 7,'
        ' "event_type": "view", "value": 1.5, "props": "{}"}\n'
        "this is not json at all\n"
    )
    good, bad = quarantine_split(read_jsonl(spark, str(p), "events"))
    assert good.count() == 1
    assert bad.count() == 1
    assert good.collect()[0].event_id == 1


def test_warc_parser_is_length_driven_and_guards():
    """A body CONTAINING the record marker must parse intact (the
    length-driven property); missing Content-Length and truncated
    bodies raise loudly."""
    import pytest

    from bigdatacw1_spark.sources.formats import build_warc, parse_warc

    tricky = b"embedded\r\n\r\nWARC/1.0\r\nlooks-like-a-record\r\n\r\nstill body"
    recs = [
        ("warcinfo", None, b"software: x\r\n"),
        ("response", "http://e.com/1", tricky),
        ("metadata", "http://e.com/1", b""),
    ]
    got = parse_warc(build_warc(recs))
    assert got == recs  # marker-in-body survives; empty body ok

    with pytest.raises(ValueError):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody-without-length")
    ok = build_warc([("response", None, b"0123456789")])
    with pytest.raises(ValueError):
        parse_warc(ok[:-6])  # truncated body
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")  # not a WARC


def test_explode_warc_operator(spark):
    from pyspark.sql import functions as F

    from bigdatacw1_spark.sources.formats import explode_warc, synth_warc_corpus
    from bigdatacw1_spark.sources.catalog import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    out = explode_warc(synth_warc_corpus(docs)).collect()
    assert len(out) == 15  # 3 records per file
    by = {(r["doc_id"], r["rec_idx"]): r for r in out}
    import hashlib
    for r in docs.collect():
        resp = by[(r["doc_id"], 1)]
        assert resp["rec_type"] == "response"
        assert resp["target_uri"] == f"http://example.com/{r['doc_id']}"
        assert resp["content_md5"] == hashlib.md5(r["text"].encode()).hexdigest()


def test_explode_zip_rejects_corrupt_archive(spark):
    import pytest
    import zipfile

    from bigdatacw1_spark.sources.formats import explode_zip

    bad = spark.createDataFrame(
        [(1, b"PK\x03\x04 not a real zip")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception) as ei:
        explode_zip(bad).collect()
    assert "BadZipFile" in str(ei.value) or "zip" in str(ei.value).lower()


def test_explode_zip_inflates_members(spark):
    import hashlib

    from bigdatacw1_spark.sources.catalog import load_table
    from bigdatacw1_spark.sources.formats import explode_zip, synth_zip_corpus
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").limit(4)
    out = {(r["doc_id"], r["member_name"]): r
           for r in explode_zip(synth_zip_corpus(docs)).collect()}
    for r in docs.collect():
        m = out[(r["doc_id"], "doc.txt")]
        assert m["member_md5"] == hashlib.md5(r["text"].encode()).hexdigest()
        assert m["member_len"] == len(r["text"].encode())


def test_common_crawl_path_end_to_end(spark):
    """The real web-ingestion flow composed: .warc.gz files → inflate +
    length-driven record parse (bodies carried) → select responses →
    robots.txt compliance gate on the request path → HTML-to-text
    extraction → Gopher quality gate. Every response body survives
    extraction with its payload text intact; the quality gate runs on
    extracted text, not markup; odd-id pages land on a disallowed path
    and are dropped BEFORE paying for extraction."""
    from pyspark.sql import functions as F

    from bigdatacw1_spark.functions.text import (
        gopher_rules,
        html_to_text,
        robots_allowed,
        robots_star_rules,
    )
    from bigdatacw1_spark.sources.catalog import load_table
    from bigdatacw1_spark.sources.formats import build_warc, explode_warc
    from tests.conftest import SF_SMALL

    import gzip

    docs = load_table(spark, SF_SMALL, "documents").limit(6).collect()

    def page(i, text):
        return (
            f'<html><head><title>T{i}</title><script>if (1 < 2) x();</script>'
            f"</head><body><p>{text}</p></body></html>"
        ).encode()

    def warc_gz(i, text):
        recs = [
            ("warcinfo", None, b"software: test\r\n"),
            ("response", uri(i), page(i, text)),
        ]
        return b"".join(gzip.compress(build_warc([r]), mtime=0) for r in recs)

    def uri(i):  # odd ids land under the disallowed /private prefix
        return f"http://e.com/{'private/' if i % 2 else ''}{i}"

    media = spark.createDataFrame(
        [(r["doc_id"], warc_gz(r["doc_id"], r["text"])) for r in docs],
        "doc_id long, payload binary",
    )
    records = explode_warc(media, gzipped=True, with_body=True)
    responses = records.where(F.col("rec_type") == "response")
    robots = F.lit("User-agent: *\nDisallow: /private")
    path = F.regexp_replace(F.col("target_uri"), r"^https?://[^/]*", "")
    responses = responses.withColumn(
        "allowed", robots_allowed(robots_star_rules(robots), path)["allowed"]
    ).where(F.col("allowed"))
    extracted = responses.select(
        "doc_id",
        "target_uri",
        html_to_text(F.col("body").cast("string")).alias("clean_text"),
    )
    gated = extracted.withColumn("keep", gopher_rules("clean_text")["keep"])

    rows = {r["doc_id"]: r for r in gated.collect()}
    assert set(rows) == {r["doc_id"] for r in docs if r["doc_id"] % 2 == 0}
    for r in docs:
        if r["doc_id"] % 2:
            continue  # robots-disallowed, dropped pre-extraction
        got = rows[r["doc_id"]]
        assert r["text"] in got["clean_text"]          # payload text survives
        assert "<" not in got["clean_text"].replace("< 2", "")  # markup gone
        assert got["target_uri"] == f"http://e.com/{r['doc_id']}"


def test_http_response_parts_edges(spark):
    """Status/content-type parse, charset parameter dropped, headerless
    payload degrades to body-only with NULL status (never lost rows)."""
    from pyspark.sql import functions as F

    from bigdatacw1_spark.sources.formats import http_response_parts

    rows = [
        (1, "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<p>hi</p>"),
        (2, "HTTP/1.0 301 Moved\r\nLocation: /x\r\n\r\n"),
        (3, "just raw bytes, no http envelope"),
        (4, "HTTP/1.1 200 OK\r\ncontent-TYPE: application/json\r\n\r\n{}"),
    ]
    df = spark.createDataFrame(rows, "i long, resp string")
    p = http_response_parts("resp")
    got = {r["i"]: r for r in df.select(
        "i", p["status"].alias("s"), p["content_type"].alias("ct"), p["body"].alias("b")
    ).collect()}
    assert (got[1]["s"], got[1]["ct"], got[1]["b"]) == (200, "text/html", "<p>hi</p>")
    assert (got[2]["s"], got[2]["ct"], got[2]["b"]) == (301, None, "")
    assert (got[3]["s"], got[3]["b"]) == (None, "just raw bytes, no http envelope")
    assert (got[4]["s"], got[4]["ct"], got[4]["b"]) == (200, "application/json", "{}")


def test_jpeg_dc_only_fixtures_roundtrip_exactly():
    """Even-valued constant-block images survive the Annex-K quantizer
    exactly (DC = 8(v-128), q00 = 16), so the REAL lossy codec must be
    lossless on the synth_jpeg_corpus fixture family."""
    from bigdatacw1_spark.operators.multimodal import decode_jpeg, encode_jpeg_gray

    for i in (0, 5, 17, 40, 63):
        w, h = (i % 4 + 1) * 8, (i % 3 + 1) * 8
        px = bytes(
            2 * ((i * 17 + (y // 8) * 5 + (x // 8) * 11) % 128)
            for y in range(h)
            for x in range(w)
        )
        dw, dh, ch, out = decode_jpeg(encode_jpeg_gray(w, h, px))
        assert (dw, dh, ch) == (w, h, 1)
        assert out == px


def test_jpeg_gradient_roundtrip_error_bounds():
    """Nonzero-AC path (runs, ZRL, EOB, magnitude coding both signs):
    q=1 must be near-lossless (|err| <= 1 from DCT float rounding);
    the standard table stays a bounded lossy approximation."""
    import numpy as np

    from bigdatacw1_spark.operators.multimodal import decode_jpeg, encode_jpeg_gray

    rng = np.random.RandomState(3)
    w, h = 32, 24
    img = (
        (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 5 + rng.randint(0, 30, (h, w)))
        % 256
    ).astype(np.uint8)
    _, _, _, out = decode_jpeg(encode_jpeg_gray(w, h, img.tobytes(), quant=[1] * 64))
    err = np.abs(np.frombuffer(out, dtype=np.uint8).reshape(h, w).astype(int) - img.astype(int))
    assert err.max() <= 1
    _, _, _, out = decode_jpeg(encode_jpeg_gray(w, h, img.tobytes()))
    err = np.abs(np.frombuffer(out, dtype=np.uint8).reshape(h, w).astype(int) - img.astype(int))
    assert err.mean() < 20


def test_jpeg_color_444_roundtrip_and_loud_failures():
    import numpy as np
    import pytest

    from bigdatacw1_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_ycbcr444,
    )

    rng = np.random.RandomState(5)
    w, h = 16, 16
    rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    dw, dh, ch, out = decode_jpeg(encode_jpeg_ycbcr444(w, h, rgb.tobytes(), quant=[1] * 64))
    assert (dw, dh, ch) == (w, h, 3)
    err = np.abs(np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3).astype(int) - rgb.astype(int))
    assert err.max() <= 4  # YCbCr<->RGB rounding only

    # progressive (SOF2) must refuse loudly, not misdecode
    jp = bytearray(encode_jpeg_gray(8, 8, bytes(64)))
    sof = jp.index(b"\xff\xc0")
    jp[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(jp))

    # subsampled chroma (4:2:0) must refuse loudly
    jp = bytearray(encode_jpeg_ycbcr444(8, 8, bytes(192)))
    sof = jp.index(b"\xff\xc0")
    jp[sof + 11] = 0x22  # Y component h=2, v=2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(jp))

    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01" + bytes(16))


def test_mjpeg_split_rejects_garbage_and_truncation():
    import pytest

    from bigdatacw1_spark.operators.multimodal import encode_jpeg_gray, split_mjpeg_frames

    a = encode_jpeg_gray(8, 8, bytes(64))
    assert split_mjpeg_frames(a * 3) == [a, a, a]
    with pytest.raises(ValueError):
        split_mjpeg_frames(a + b"junk")
    with pytest.raises(ValueError):
        split_mjpeg_frames(a[:-2])  # EOI stripped -> unterminated


def test_jpeg_bitreader_unstuffing_restarts_and_truncation():
    import pytest

    from bigdatacw1_spark.operators.multimodal import _BitReader

    # FF00 unstuffs to a literal FF byte
    br = _BitReader(b"\xff\x00\x80", 0)
    assert br.read_bits(8) == 0xFF
    assert br.read_bits(8) == 0x80

    # a restart marker is consumed transparently at the next byte fetch
    # and flags itself; valid streams only hit restarts at symbol
    # boundaries, so leftover bits of the current byte still serve first
    br = _BitReader(b"\xa0\xff\xd3\x55", 0)
    assert br.read_bits(4) == 0xA
    assert br.read_bits(8) == 0x05  # 4 leftover zero bits, then 0101 of 0x55
    assert br.restart_seen
    assert br.read_bits(4) == 0x5  # low nibble of 0x55 continues

    # any other marker ends the scan; reading past it raises
    br = _BitReader(b"\xff\xd9", 0)
    with pytest.raises(ValueError):
        br.read_bit()


# ---------------------------------------------------------------------------
# WARC Python DataSource (spark.read.format("warc"))
# ---------------------------------------------------------------------------

def _write_warc_fixture_dir(tmp_path, n_files=6):
    from bigdatacw1_spark.sources.formats import build_warc

    for i in range(n_files):
        blob = build_warc(
            [
                ("warcinfo", None, b"fixture\r\n"),
                ("response", f"http://a.example/{i}", f"body {i}".encode()),
                ("response", f"http://b.example/{i}", f"other {i}".encode()),
                ("metadata", f"http://a.example/{i}", b"m"),
            ]
        )
        (tmp_path / f"f{i}.warc").write_bytes(blob)
    return str(tmp_path)


def test_warc_datasource_reads_all_records(spark, tmp_path):
    from bigdatacw1_spark.sources.warc_datasource import WarcDataSource

    d = _write_warc_fixture_dir(tmp_path)
    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load(d + "/*.warc")
    assert df.count() == 6 * 4
    assert "body" not in df.columns  # bodies pruned unless asked
    # default reader: stateless — a filtered query on the SAME DataFrame
    # never contaminates a later unfiltered one
    assert df.where(F.col("rec_type") == "response").count() == 12
    assert df.count() == 6 * 4
    with_body = (
        spark.read.format("warc").option("with_body", "true").load(d + "/*.warc")
    )
    row = with_body.where(
        (F.col("warc_file") == "f2.warc") & (F.col("rec_idx") == 1)
    ).collect()[0]
    assert bytes(row["body"]) == b"body 2"


def test_warc_datasource_pushdown_matches_post_filter(spark, tmp_path):
    """Opt-in pushdown is an optimization, not a semantics change: each
    pushed predicate returns exactly what filtering the full scan would
    (one fresh load() per query — the documented usage contract)."""
    from bigdatacw1_spark.sources.warc_datasource import WarcDataSource

    d = _write_warc_fixture_dir(tmp_path)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)

    def fresh():
        return (
            spark.read.format("warc")
            .option("pushdown", "true")
            .load(d + "/*.warc")
        )

    pushed = fresh().where(
        (F.col("rec_type") == "response")
        & F.col("target_uri").startswith("http://a.example/")
    ).collect()
    assert len(pushed) == 6
    assert all(r["rec_type"] == "response" for r in pushed)
    assert all(r["target_uri"].startswith("http://a.example/") for r in pushed)
    # IN-list pushes; unsupported predicate (content_len) evaluates post-scan
    assert fresh().where(
        F.col("rec_type").isin("response", "metadata")
    ).count() == 18
    lens = [r["content_len"] for r in fresh().collect()]
    assert fresh().where(F.col("content_len") > 6).count() == sum(
        1 for x in lens if x > 6
    )


def test_warc_datasource_partitions_bin_pack(tmp_path):
    from pyspark.sql.types import StructType

    from bigdatacw1_spark.sources.warc_datasource import WarcReaderBase, _warc_schema

    d = _write_warc_fixture_dir(tmp_path, n_files=10)
    import os

    sz = os.path.getsize(os.path.join(d, "f0.warc"))
    # target = 3 files' worth -> ceil(10/3) = 4 partitions
    r = WarcReaderBase(
        _warc_schema(False),
        {"path": d + "/*.warc", "target_partition_bytes": str(3 * sz + 1)},
    )
    parts = r.partitions()
    assert len(parts) == 4
    assert sorted(p for part in parts for p in part.paths) == sorted(
        os.path.join(d, f"f{i}.warc") for i in range(10)
    )
    # one giant target -> a single partition; zero matches -> loud error
    r1 = WarcReaderBase(_warc_schema(False), {"path": d + "/*.warc"})
    assert len(r1.partitions()) == 1
    import pytest

    r2 = WarcReaderBase(_warc_schema(False), {"path": d + "/nope-*.warc"})
    with pytest.raises(FileNotFoundError):
        r2.partitions()
