"""Ingest-path tests: the reference's parse semantics on the committed
fixtures (REF LogProcessor::parse behaviors from SURVEY.md §3.1)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from mediaplaycounts_spark.ingest import (
    corrupt_records,
    daily_playcounts,
    parse_raw,
    read_raw,
)

FIXTURES = str(Path(__file__).resolve().parents[1] / "fixtures" / "mediacounts")
CLEAN = f"{FIXTURES}/mediacounts.2024-01-0[12].v00.tsv"
CORRUPT = f"{FIXTURES}/mediacounts.2024-01-03.v00.tsv"


def test_media_extension_whitelist(spark):
    parsed = parse_raw(read_raw(spark, CLEAN))
    files = {r["file"] for r in parsed.select("file").distinct().collect()}
    assert "Portrait.jpg" not in files
    assert "Diagram.svg" not in files
    assert "Concert.ogv" in files


def test_url_decode(spark):
    parsed = parse_raw(read_raw(spark, CLEAN))
    files = {r["file"] for r in parsed.select("file").distinct().collect()}
    assert "Accordion solo.ogg" in files  # %20 decoded
    assert not any("%20" in f for f in files)


def test_plays_formula_and_duplicate_sum(spark):
    """plays = original + transcoded audio + transcoded video, SUMMED
    over duplicate rows of the same file (day 1 has Concert.ogv twice:
    100+0+180 and 2+0+5 -> 287)."""
    pc = daily_playcounts(spark, CLEAN)
    row = pc.filter(
        (F.col("file") == "Concert.ogv") & (F.col("date") == F.lit("2024-01-01"))
    ).head()
    assert row["count"] == 287


def test_date_from_filename(spark):
    pc = daily_playcounts(spark, CLEAN)
    days = {str(r["date"]) for r in pc.select("date").distinct().collect()}
    assert days == {"2024-01-01", "2024-01-02"}


def test_corrupt_record_routing(spark):
    raw = read_raw(spark, CORRUPT)
    bad = corrupt_records(raw).collect()
    assert len(bad) == 2
    lines = {b["raw_line"] for b in bad}
    assert any("Broken.ogv" in l for l in lines)      # non-numeric count
    assert any("Truncated.webm" in l for l in lines)  # short row
    # good rows still parse on the same day
    good = parse_raw(raw)
    assert good.count() == 4


def test_idempotent_daily_overwrite(spark, tmp_path):
    """Re-running a day replaces exactly that day's partition."""
    from mediaplaycounts_spark.ingest.mediacounts import write_daily

    out = str(tmp_path / "pc")
    pc = daily_playcounts(spark, CLEAN)
    write_daily(pc, out)
    before = spark.read.parquet(out).count()
    # re-run day 1 with doubled counts: day 1 replaced, day 2 untouched
    doubled = pc.filter(F.col("date") == "2024-01-01").withColumn(
        "count", F.col("count") * 2
    )
    write_daily(doubled, out)
    after = spark.read.parquet(out)
    assert after.count() == before
    row = after.filter(
        (F.col("file") == "Concert.ogv") & (F.col("date") == F.lit("2024-01-01"))
    ).head()
    assert row["count"] == 574  # 287 * 2


# ---------------------------------------------------------------- fetch

BZ2_FIXTURES = Path(__file__).resolve().parents[1] / "fixtures" / "mediacounts_bz2"


def test_download_day_file_url_and_idempotence(tmp_path):
    """VERDICT r4 missing #1: fetch against a file:// mirror of the dump
    tree (the committed bz2 fixture), idempotent re-run, atomic naming."""
    import datetime as dt

    from mediaplaycounts_spark.ingest.fetch import download_day, dump_filename

    # lay the fixture out like the dump tree: <base>/daily/<year>/<name>
    base = tmp_path / "tree"
    daydir = base / "daily" / "2024"
    daydir.mkdir(parents=True)
    name = dump_filename(dt.date(2024, 1, 1))
    (daydir / name).write_bytes(
        (BZ2_FIXTURES / "mediacounts.2024-01-01.v00.tsv.bz2").read_bytes()
    )
    out = tmp_path / "landed"
    got = download_day(
        dt.date(2024, 1, 1), out, base_url=f"file://{base}"
    )
    assert got.name == name and got.stat().st_size > 0
    assert not got.with_suffix(got.suffix + ".part").exists()
    mtime = got.stat().st_mtime_ns
    again = download_day(dt.date(2024, 1, 1), out, base_url=f"file://{base}")
    assert again == got and got.stat().st_mtime_ns == mtime, (
        "existing non-empty target must be a no-op"
    )


def test_download_day_failure_leaves_no_partial(tmp_path):
    import datetime as dt

    import pytest

    from mediaplaycounts_spark.ingest.fetch import download_day

    out = tmp_path / "landed"
    with pytest.raises(RuntimeError, match="download failed"):
        download_day(
            dt.date(2024, 1, 2),
            out,
            base_url=f"file://{tmp_path}/missing-tree",
            retries=1,
            backoff_s=0.0,
        )
    assert not list(out.glob("*")), "failed fetch must leave nothing behind"


def test_download_day_404_fails_fast(tmp_path, monkeypatch):
    import datetime as dt
    import urllib.error
    import urllib.request

    import pytest

    from mediaplaycounts_spark.ingest import fetch

    calls = {"n": 0}

    def fake_urlopen(url, timeout=None):
        calls["n"] += 1
        raise urllib.error.HTTPError(url, 404, "Not Found", None, None)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    with pytest.raises(fetch.DumpNotPublished):
        fetch.download_day(dt.date(2099, 1, 1), tmp_path, retries=3, backoff_s=0.0)
    assert calls["n"] == 1, "404 (day not published) must not retry"


def test_download_days_isolates_bad_days(tmp_path, monkeypatch):
    import datetime as dt
    import urllib.error
    import urllib.request

    from mediaplaycounts_spark.ingest import fetch

    def fake_urlopen(url, timeout=None):
        if "2024-01-02" in url:
            raise urllib.error.HTTPError(url, 404, "Not Found", None, None)
        import io

        class R(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return R(b"payload")

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    res = fetch.download_days(
        dt.date(2024, 1, 1), dt.date(2024, 1, 3), tmp_path, backoff_s=0.0
    )
    assert res == {
        "2024-01-01": "ok",
        "2024-01-02": "not-published",
        "2024-01-03": "ok",
    }


def test_download_day_rejects_truncated_body(tmp_path, monkeypatch):
    """ADVICE r5 (medium): read() returning b'' on premature connection
    close exits the chunk loop cleanly — the landed file must be
    rejected against Content-Length, retried, and NEVER renamed into
    place (else the exists-non-empty idempotence check pins the corrupt
    file forever)."""
    import datetime as dt
    import email.message
    import io
    import urllib.request

    import pytest

    from mediaplaycounts_spark.ingest import fetch

    calls = {"n": 0}

    def fake_urlopen(url, timeout=None):
        calls["n"] += 1

        class R(io.BytesIO):
            headers = email.message.Message()
            headers["Content-Length"] = "100"

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return R(b"only-9-by")  # 9 bytes < declared 100: truncated

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    day = dt.date(2024, 2, 1)
    with pytest.raises(RuntimeError, match="download failed"):
        fetch.download_day(day, tmp_path, retries=2, backoff_s=0.0)
    assert calls["n"] == 3, "short body must be retried like any failure"
    target = tmp_path / fetch.dump_filename(day)
    assert not target.exists(), "truncated body must never land"
    assert not target.with_suffix(target.suffix + ".part").exists()


# ------------------------------------------------- category snapshot

CAT_FIXTURE = str(
    Path(__file__).resolve().parents[1]
    / "fixtures"
    / "categorymembers"
    / "recorded.jsonl"
)


def test_membership_snapshot_recursive_cycle_safe(spark):
    """VERDICT r4 missing #2: recorded categorymembers JSONL -> flat
    (root, file) snapshot. Covers subcategory recursion, cmcontinue
    pagination (Sub2 split over two pages), a Root<-Deep CYCLE, a
    non-file non-category member (ns=0, ignored), and a corrupt line."""
    from mediaplaycounts_spark.ingest.categories import build_membership_snapshot

    snap = build_membership_snapshot(spark, CAT_FIXTURE, "Category:Root")
    rows = {(r.category, r.file) for r in snap.collect()}
    assert rows == {
        ("Category:Root", "A sound.ogg"),
        ("Category:Root", "B clip.webm"),
        ("Category:Root", "C tone.wav"),   # via Sub1 -> Deep
        ("Category:Root", "D take.flac"),  # Sub2 page 1
        ("Category:Root", "E song.mid"),   # Sub2 page 2 (pagination)
    }


def test_membership_snapshot_depth_bound(spark):
    from mediaplaycounts_spark.ingest.categories import build_membership_snapshot

    direct = build_membership_snapshot(spark, CAT_FIXTURE, "Category:Root", max_depth=0)
    assert {r.file for r in direct.collect()} == {"A sound.ogg"}
    one_hop = build_membership_snapshot(spark, CAT_FIXTURE, "Category:Root", max_depth=1)
    assert {r.file for r in one_hop.collect()} == {
        "A sound.ogg", "B clip.webm", "D take.flac", "E song.mid"
    }


def test_membership_snapshot_feeds_semi_join(spark):
    """The snapshot is a drop-in members table for the serving path:
    semi-join it against a playcounts-shaped fact."""
    from mediaplaycounts_spark.ingest.categories import build_membership_snapshot

    snap = build_membership_snapshot(spark, CAT_FIXTURE, "Category:Root")
    facts = spark.createDataFrame(
        [("A sound.ogg", 5), ("B clip.webm", 7), ("Unrelated.ogv", 99)],
        "file string, count long",
    )
    kept = facts.join(
        F.broadcast(snap.select("file")), "file", "leftsemi"
    )
    assert {r.file for r in kept.collect()} == {"A sound.ogg", "B clip.webm"}
