"""HTTP month-file ingestion loop (sources/http_loader.py): grid
enumeration, atomic resume-safe downloads, gap/error manifest rows --
driven over file:// URLs (this container has no network; the code path
is identical for http(s) since both go through urllib)."""

from __future__ import annotations

import os
import pathlib

import pytest

from taxi_data_pipeline_pset2_spark.sources import http_loader as hl


def _uri(p) -> str:
    return pathlib.Path(p).as_uri()


def _write_month(spark, src_dir, service, year, month, n_rows):
    path = os.path.join(src_dir, f"{service}_tripdata_{year}-{month:02d}.parquet")
    spark.range(n_rows).selectExpr("id", "id * 2 AS fare").coalesce(
        1
    ).write.mode("overwrite").parquet(path + ".d")
    # single flat file, like the reference's monthly artifacts
    part = next(
        f
        for f in os.listdir(path + ".d")
        if f.endswith(".parquet")
    )
    os.replace(os.path.join(path + ".d", part), path)
    return path


def _template(src_dir) -> str:
    return _uri(src_dir) + "/{service}_tripdata_{year}-{month:02d}.parquet"


def test_month_grid_enumeration():
    grid = hl.month_grid(
        "x://{service}/{year}-{month:02d}",
        "/tmp/d",
        services=("yellow",),
        start=(2023, 11),
        end=(2024, 2),
    )
    assert [(g.year, g.month) for g in grid] == [
        (2023, 11), (2023, 12), (2024, 1), (2024, 2)
    ]
    assert grid[0].run_id == "yellow_2023_11"
    assert grid[0].url == "x://yellow/2023-11"
    with pytest.raises(ValueError, match="after end"):
        hl.month_grid("u", "/tmp/d", start=(2024, 2), end=(2024, 1))


def test_download_is_atomic_resumable_and_retries(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"x" * 20_000)  # > one 8192 chunk
    dest = str(tmp_path / "out" / "got.bin")
    n = hl.download_file(_uri(src), dest)
    assert n == 20_000 and open(dest, "rb").read() == b"x" * 20_000
    assert not os.path.exists(dest + ".part")
    # resume: an existing complete dest is NOT re-downloaded
    before = os.path.getmtime(dest)
    src.write_bytes(b"y")  # source changed; resume must not touch dest
    assert hl.download_file(_uri(src), dest) == 20_000
    assert os.path.getmtime(dest) == before
    # failure: retries exhaust, error surfaces, no .part left behind
    missing = _uri(tmp_path / "absent.bin")
    dest2 = str(tmp_path / "out" / "fail.bin")
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        hl.download_file(missing, dest2, retries=2, backoff_s=0.0)
    assert not os.path.exists(dest2) and not os.path.exists(dest2 + ".part")


def test_probe_url_file_scheme(tmp_path):
    f = tmp_path / "a.parquet"
    f.write_bytes(b"pq")
    assert hl.probe_url(_uri(f))
    assert not hl.probe_url(_uri(tmp_path / "nope.parquet"))


def test_load_month_files_manifest_and_idempotence(spark, tmp_path):
    src = str(tmp_path / "remote")
    os.makedirs(src)
    dest = str(tmp_path / "landing")
    rows_by_month = {1: 10, 2: 7, 4: 3}  # month 3 missing -> brecha
    for m, n in rows_by_month.items():
        _write_month(spark, src, "yellow", 2024, m, n)
    manifest = hl.load_month_files(
        spark,
        _template(src),
        dest,
        services=("yellow",),
        start=(2024, 1),
        end=(2024, 4),
        parallelism=3,
    ).collect()
    by_month = {r.month: r for r in manifest}
    assert len(manifest) == 4
    for m, n in rows_by_month.items():
        r = by_month[m]
        assert r.status == "ok" and r.n_rows == n and r.n_columns == 2
        assert r.file_size_bytes == os.path.getsize(
            os.path.join(dest, f"yellow_2024_{m:02d}.parquet")
        )
    gap = by_month[3]
    assert gap.status == "brecha"
    assert gap.n_rows is None and gap.file_size_bytes is None
    # idempotent re-run: same manifest, downloads skipped (mtimes fixed)
    mtimes = {
        f: os.path.getmtime(os.path.join(dest, f)) for f in os.listdir(dest)
    }
    again = hl.load_month_files(
        spark, _template(src), dest, services=("yellow",),
        start=(2024, 1), end=(2024, 4),
    ).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in manifest]
    assert mtimes == {
        f: os.path.getmtime(os.path.join(dest, f)) for f in os.listdir(dest)
    }


def test_month_grid_rejects_out_of_range_months():
    with pytest.raises(ValueError, match="months must be 1..12"):
        hl.month_grid("u", "/tmp/d", start=(2024, 13), end=(2025, 1))


def test_local_month_survives_probe_outage(spark, tmp_path, monkeypatch):
    """A locally complete month must stay status='ok' even when the
    remote probe fails on a rerun (network blip, upstream retiring old
    months) -- re-probing data already on disk would demote it to a
    false gap row."""
    src = str(tmp_path / "remote")
    os.makedirs(src)
    dest = str(tmp_path / "landing")
    _write_month(spark, src, "yellow", 2024, 1, 5)
    kw = dict(services=("yellow",), start=(2024, 1), end=(2024, 1))
    first = hl.load_month_files(spark, _template(src), dest, **kw).collect()
    assert first[0].status == "ok"
    monkeypatch.setattr(hl, "probe_url", lambda url, timeout=10.0: False)
    again = hl.load_month_files(spark, _template(src), dest, **kw).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in first]


def test_corrupt_download_is_error_and_removed(spark, tmp_path):
    """A 200-but-not-parquet artifact (CDN error page) must record
    status='error' AND be deleted -- under its final name it would
    satisfy the resume rule and poison every rerun."""
    src = str(tmp_path / "remote")
    os.makedirs(src)
    with open(os.path.join(src, "yellow_tripdata_2024-01.parquet"), "wb") as f:
        f.write(b"<html>503 service unavailable</html>")
    dest = str(tmp_path / "landing")
    manifest = hl.load_month_files(
        spark, _template(src), dest,
        services=("yellow",), start=(2024, 1), end=(2024, 1),
    ).collect()
    assert manifest[0].status == "error"
    assert not os.path.exists(os.path.join(dest, "yellow_2024_01.parquet"))
    # and a later run with the artifact fixed recovers to ok
    _write_month(spark, src, "yellow", 2024, 1, 4)
    fixed = hl.load_month_files(
        spark, _template(src), dest,
        services=("yellow",), start=(2024, 1), end=(2024, 1),
    ).collect()
    assert fixed[0].status == "ok" and fixed[0].n_rows == 4


def test_load_month_files_error_status_when_download_fails(
    spark, tmp_path, monkeypatch
):
    """Probe ok but download exhausts retries -> status='error', the
    grid continues (the reference would abort the whole run)."""
    monkeypatch.setattr(hl, "probe_url", lambda url, timeout=10.0: True)
    manifest = hl.load_month_files(
        spark,
        _template(str(tmp_path / "empty")),
        str(tmp_path / "landing"),
        services=("yellow",),
        start=(2024, 1),
        end=(2024, 2),
        retries=2,
        backoff_s=0.0,
    ).collect()
    assert [r.status for r in manifest] == ["error", "error"]
    assert all(r.n_rows is None for r in manifest)


def test_download_retries_mid_body_http_truncation(tmp_path, monkeypatch):
    """An http.client.HTTPException mid-body (IncompleteRead on a dropped
    connection) must enter the retry loop like a URLError -- not abort
    the whole grid (the reference's failure mode this module fixes)."""
    import http.client
    import urllib.request

    src = tmp_path / "payload.bin"
    src.write_bytes(b"x" * 64)
    calls = {"n": 0}
    real_urlopen = urllib.request.urlopen

    def flaky(url, timeout=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise http.client.IncompleteRead(b"x" * 10)
        return real_urlopen(url, timeout=timeout)

    monkeypatch.setattr(hl.urllib.request, "urlopen", flaky)
    dest = tmp_path / "out.bin"
    n = hl.download_file(_uri(src), str(dest), retries=3, backoff_s=0.0)
    assert n == 64 and dest.read_bytes() == b"x" * 64
    assert calls["n"] == 2
    assert not (tmp_path / "out.bin.part").exists()


def test_probe_url_malformed_scheme_is_loud(tmp_path):
    """A typo'd url_template is a caller bug: probe_url must raise, not
    record an all-'brecha' manifest for a pure config error."""
    with pytest.raises(ValueError):
        hl.probe_url("http://[bad-template/{year}.parquet")


def test_download_fsyncs_before_rename(tmp_path, monkeypatch):
    """The 'exists == complete' resume rule requires the payload to be
    durable BEFORE os.replace surfaces the final name: a power loss
    after an unfsynced rename can leave a complete-looking file with
    lost bytes (definition-level audit, r12). Pin the ordering:
    fsync(part) happens, and happens before the rename."""
    import os as _os

    from taxi_data_pipeline_pset2_spark.sources.http_loader import (
        download_file,
    )

    src = tmp_path / "payload.bin"
    src.write_bytes(b"x" * 1024)
    calls: list[str] = []
    real_fsync, real_replace = _os.fsync, _os.replace
    monkeypatch.setattr(
        _os, "fsync", lambda fd: (calls.append("fsync"), real_fsync(fd))[1]
    )
    monkeypatch.setattr(
        _os,
        "replace",
        lambda a, b: (calls.append("replace"), real_replace(a, b))[1],
    )
    dest = str(tmp_path / "out.bin")
    n = download_file(f"file://{src}", dest)
    assert n == 1024 and _os.path.getsize(dest) == 1024
    assert "fsync" in calls, "payload never fsynced before rename"
    assert calls.index("fsync") < calls.index("replace")
