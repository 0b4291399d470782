"""Byte-identity invariant: extract_text(html) == text for every row
(BASELINE.json input_hint), mirroring the reference's exact-dtype scan
contract (utils/readfile.py:319-388 returns stored values unaltered)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mintpy_spark.datagen import gen_pages
from mintpy_spark.operators.extract import extract_text, extract_text_bytes


def test_extract_bytes_roundtrip_unit():
    body = "héllo wörld — ünïcode ✓".encode()
    html = b"<html>\xff\xfe<head>junk\x80</head><body>" + body + b"</body>\x81</html>"
    assert extract_text_bytes(html) == body


def test_extract_bytes_marker_in_text():
    # text containing the literal close marker survives (first-open/last-close)
    body = b"a</body>b"
    html = b"<body>" + body + b"</body>"
    assert extract_text_bytes(html) == body


def test_extract_bytes_malformed():
    assert extract_text_bytes(b"no markers here") is None
    assert extract_text_bytes(b"</body><body>") is None
    assert extract_text_bytes(None) is None


def test_extract_matches_text_column_exactly(spark):
    pages = gen_pages(spark, num_urls=60)
    got = extract_text(pages)
    # byte-identical: compare sha1 of UTF-8 bytes on both columns, JVM-side
    mism = got.where(
        F.sha1(F.encode("extracted_text", "UTF-8")) != F.sha1(F.encode("text", "UTF-8"))
    ).count()
    total = got.count()
    nulls = got.where(F.col("extracted_text").isNull()).count()
    assert total > 0 and mism == 0 and nulls == 0


def test_extract_drops_html_column(spark):
    pages = gen_pages(spark, num_urls=5)
    got = extract_text(pages)
    assert "html" not in got.columns and "extracted_text" in got.columns


def test_jvm_and_arrow_extractors_agree(spark):
    from mintpy_spark.operators.extract import extract_text_arrow

    pages = gen_pages(spark, num_urls=40)
    jvm = extract_text(pages).select("url", "warc_ts", "extracted_text")
    arrow = extract_text_arrow(pages).select(
        "url", "warc_ts", F.col("extracted_text").alias("arrow_text")
    )
    j = jvm.join(arrow, ["url", "warc_ts"])
    assert j.count() > 0
    assert j.where(F.col("extracted_text") != F.col("arrow_text")).count() == 0


def test_length_pruned_path_matches_materializing_path(spark):
    """extract_text_length == octet_length(extract_text) row-for-row on
    the correctness corpus — the equality that lets the ingest bench skip
    the body copy."""
    from mintpy_spark.operators.extract import extract_text, extract_text_length

    pages = gen_pages(spark, num_urls=80)
    slow = extract_text(pages).select(
        "url", "warc_ts", F.octet_length("extracted_text").cast("long").alias("slow_len")
    )
    fast = extract_text_length(pages).select("url", "warc_ts", "text_length")
    j = slow.join(fast, ["url", "warc_ts"])
    assert j.count() > 0
    assert (
        j.where(
            ~(F.col("slow_len").eqNullSafe(F.col("text_length")))
        ).count()
        == 0
    )


def test_length_pruned_path_null_semantics(spark):
    """Malformed pages NULL out under the identical condition as
    extract_text (marker presence/order is decode-view-independent)."""
    from mintpy_spark.operators.extract import extract_text_length

    rows = [
        (1, b"<html><body>plain ascii</body></html>"),
        (2, b"<html>\xff\xfe<body>" + "ünïcode ✓".encode() + b"</body>\x80</html>"),
        (3, b"no markers"),
        (4, b"</body><body>"),
        (5, b"<body>a</body>mid</body>"),
        (6, b"<body></body>"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {r.id: r.text_length for r in extract_text_length(df).collect()}
    assert got[1] == len(b"plain ascii")
    assert got[2] == len("ünïcode ✓".encode())
    assert got[3] is None and got[4] is None and got[7] is None
    assert got[5] == len(b"a</body>mid")
    assert got[6] == 0


def test_obs_lengths_matches_obs_extracted(spark):
    from mintpy_spark.operators.observe import pages_to_obs_extracted, pages_to_obs_lengths

    pages = gen_pages(spark, num_urls=50)
    a = pages_to_obs_extracted(pages).drop("text_sha")
    b = pages_to_obs_lengths(pages)
    assert a.columns == b.columns
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_jvm_extractor_malformed_and_unicode(spark):
    rows = [
        (1, b"<html><body>plain ascii</body></html>"),
        (2, b"<html>\xff\xfe<body>" + "ünïcode ✓".encode() + b"</body>\x80</html>"),
        (3, b"no markers"),
        (4, b"</body><body>"),  # close before open
        (5, b"<body>a</body>mid</body>"),  # last close wins
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {r.id: r.extracted_text for r in extract_text(df).collect()}
    assert got[1] == "plain ascii"
    assert got[2] == "ünïcode ✓"
    assert got[3] is None
    assert got[4] is None
    assert got[5] == "a</body>mid"


def test_langid_ngram_classifies_natural_text(spark):
    """The trigram-profile classifier carries real language signal, not
    just deterministic shape: short natural-language samples classify to
    the right profile; profile-free strings fall to 'unknown'."""
    from mintpy_spark.functions.langid import classify

    samples = [
        (0, "the quick brown fox is one of the animals in the old story"),
        (1, "der hund und die katze sind ein gutes beispiel aus dem buch"),
        (2, "le chat et le chien sont des animaux que la ville connait"),
        (3, "el perro y el gato son los animales que la gente quiere"),
        (4, "zzzz qqqq xxxx"),
    ]
    df = spark.createDataFrame(samples, "doc_id long, text string")
    got = {r.doc_id: r.guess for r in classify(df).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "unknown"


def test_langid_wide_profiles_classify_ten_languages(spark):
    """Round-3 profile breadth: all ten languages — including the two
    non-Latin scripts — classify natural-text samples correctly."""
    from mintpy_spark.functions.langid import PROFILES, classify

    assert len(PROFILES) == 10
    samples = [
        (0, "the quick brown fox is one of the animals in the old story", "en"),
        (1, "der hund und die katze sind ein gutes beispiel aus dem buch", "de"),
        (2, "le chat et le chien sont des animaux que la ville connait", "fr"),
        (3, "el perro y el gato son los animales que la gente quiere", "es"),
        (4, "il cane e il gatto sono gli animali che la gente vuole bene", "it"),
        (5, "o cachorro e um gato são do parque para a população da cidade", "pt"),
        (6, "het huis van een aardig gezin is natuurlijk dichtbij de gracht", "nl"),
        (7, "собака и кошка что живут на улице около старого дома", "ru"),
        (8, "το σπίτι και ο κήπος της πόλης ου παλιού δρόμου", "el"),
        (9, "bir kedi ve bir köpek evin bahçesinde yaşıyor dır", "tr"),
        (10, "zzzz qqqq xxxx", "unknown"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in samples], "doc_id long, text string"
    )
    got = {r.doc_id: r.guess for r in classify(df).collect()}
    for i, _t, lang in samples:
        assert got[i] == lang, f"sample {i}: got {got[i]}, want {lang}"
