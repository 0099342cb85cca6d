"""Monthly-file HTTP ingestion loop (SURVEY.md S4/§3.1): the driver-side
download stage in front of the typed readers.

Reference behavior re-expressed (``loader_yellow_green.py:13-19`` HEAD
probe -> ``status='brecha'`` for missing months; ``:63-79`` chunked
streaming download with skip-if-present resume; ``:71-76`` footer-only
parquet metadata into a per-run manifest row): iterate a
(service, year, month) grid, probe each URL, download what exists,
record one manifest row per month. Differences, on purpose:

- **stdlib urllib, not requests** (no third-party dependency; handles
  ``http(s)://`` and -- what the tests use, since this container has no
  network -- ``file://``).
- **Atomic downloads.** The reference streams straight into the final
  path and later trusts ``os.path.exists``; a download killed mid-file
  leaves a truncated parquet that every later run "resumes" past. Here
  the stream goes to ``<dest>.part`` and ``os.replace``s into place
  only on success, so a file's existence IS its completeness proof and
  the skip-if-present resume is safe.
- **Bounded retries with backoff** per file (the reference aborts the
  whole run on one flaky GET); a month that still fails after retries
  records ``status='error'`` instead of killing the grid -- the
  resume-on-rerun semantics the manifest exists for.
- **Threaded grid.** Downloads are I/O-bound driver-side glue (like the
  reference's Mage block); a small thread pool overlaps them. The data
  files themselves are then read DISTRIBUTED by the typed readers
  (sources/readers.py) -- Spark never funnels table bytes through this
  loop, so the loop's scale burden is months x services, not data size.

The returned manifest is a Spark DataFrame matching the reference's
columns (run_id, year, month, service, url, status, n_rows, n_columns,
file_size_bytes); feed it to sources/manifest.py ``coverage_gaps`` /
``load_manifest`` for the gap/resume bookkeeping. Footer metadata comes
from pyarrow.parquet.ParquetFile -- rows/columns without reading a
single data page, same as the reference.
"""

from __future__ import annotations

import http.client
import os
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_CHUNK = 8192  # the reference's iter_content chunk size

MANIFEST_SCHEMA = (
    "run_id string, year int, month int, service string, url string, "
    "status string, n_rows bigint, n_columns int, file_size_bytes bigint"
)


@dataclass(frozen=True)
class MonthFile:
    service: str
    year: int
    month: int
    url: str
    dest: str

    @property
    def run_id(self) -> str:
        return f"{self.service}_{self.year}_{self.month:02d}"


def month_grid(
    url_template: str,
    dest_dir: str,
    services: tuple[str, ...] = ("yellow", "green"),
    start: tuple[int, int] = (2015, 1),
    end: tuple[int, int] = (2025, 12),
) -> list[MonthFile]:
    """The (service, year, month) iteration space as MonthFile specs.
    ``url_template`` takes {service}, {year}, {month:02d}; files land as
    ``<dest_dir>/<service>_<year>_<month>.parquet``."""
    (y0, m0), (y1, m1) = start, end
    if not (1 <= m0 <= 12 and 1 <= m1 <= 12):
        # an out-of-range start month would never hit the ==12 rollover
        # and the grid loop would append forever
        raise ValueError(f"months must be 1..12: start={start} end={end}")
    if (y0, m0) > (y1, m1):
        raise ValueError(f"start {start} after end {end}")
    out = []
    for service in services:
        y, m = y0, m0
        while (y, m) <= (y1, m1):
            url = url_template.format(service=service, year=y, month=m)
            out.append(
                MonthFile(
                    service,
                    y,
                    m,
                    url,
                    os.path.join(dest_dir, f"{service}_{y}_{m:02d}.parquet"),
                )
            )
            y, m = (y + 1, 1) if m == 12 else (y, m + 1)
    return out


def probe_url(url: str, timeout: float = 10.0) -> bool:
    """Availability probe: HEAD for http(s) (the reference's check_url),
    a metadata open for file:// -- False on any transport error, like
    the reference's except-all (a probe failure IS the 'brecha'
    signal). A malformed URL (urlopen's ValueError, e.g. a typo'd
    scheme in the template) is a CALLER bug and propagates: swallowing
    it would record an all-'brecha' manifest for a pure config error."""
    try:
        req = urllib.request.Request(
            url, method="HEAD" if url.startswith(("http://", "https://")) else "GET"
        )
        with urllib.request.urlopen(req, timeout=timeout):
            return True
    except (urllib.error.URLError, http.client.HTTPException, OSError):
        return False


def download_file(
    url: str,
    dest: str,
    retries: int = 3,
    backoff_s: float = 0.1,
    timeout: float = 60.0,
) -> int:
    """Stream ``url`` to ``dest`` atomically; returns bytes written.
    Chunked read (never the whole body in memory), ``<dest>.part`` +
    ``os.replace`` so a completed path is always a complete file, and
    ``retries`` attempts with linear backoff before the error
    propagates. An already-present ``dest`` is returned as-is (the
    resume rule -- safe because only complete files get the final
    name)."""
    if os.path.exists(dest):
        return os.path.getsize(dest)
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    part = dest + ".part"
    last: Exception | None = None
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r, open(
                part, "wb"
            ) as f:
                while True:
                    chunk = r.read(_CHUNK)
                    if not chunk:
                        break
                    f.write(chunk)
                # flush+fsync BEFORE the rename: os.replace is atomic
                # against process crash, but without fsync a power loss
                # can surface the final name with unflushed bytes --
                # violating the 'exists == complete' resume rule this
                # module's skip-if-present depends on (definition-level
                # audit, r12)
                f.flush()
                os.fsync(f.fileno())
            os.replace(part, dest)
            return os.path.getsize(dest)
        # HTTPException covers mid-body failures URLError does not
        # (http.client.IncompleteRead on a dropped connection): without
        # it one flaky month would abort the whole ingestion grid --
        # exactly the reference behavior this module exists to fix
        except (
            urllib.error.URLError,
            http.client.HTTPException,
            OSError,
        ) as e:  # retry, then surface
            last = e
            if os.path.exists(part):
                os.remove(part)
            if attempt + 1 < retries:
                time.sleep(backoff_s * (attempt + 1))
    raise RuntimeError(f"download failed after {retries} attempts: {url}") from last


def _parquet_footer_meta(path: str) -> tuple[int, int]:
    """(n_rows, n_columns) from the footer only -- no data pages read
    (the reference's pq.ParquetFile metadata probe)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    return int(pf.metadata.num_rows), len(pf.schema_arrow.names)


def load_month_files(
    spark: SparkSession,
    url_template: str,
    dest_dir: str,
    services: tuple[str, ...] = ("yellow", "green"),
    start: tuple[int, int] = (2015, 1),
    end: tuple[int, int] = (2025, 12),
    retries: int = 3,
    backoff_s: float = 0.1,
    parallelism: int = 4,
) -> DataFrame:
    """Run the ingestion grid; returns the manifest DataFrame (one row
    per (service, month), MANIFEST_SCHEMA). Months whose probe fails are
    ``status='brecha'`` with no download attempt; downloads that exhaust
    retries are ``status='error'`` (grid continues); successes are
    ``status='ok'`` with footer n_rows/n_columns and on-disk size.
    Re-running is idempotent: complete files are skipped, gaps and
    errors are re-probed."""
    grid = month_grid(url_template, dest_dir, services, start, end)

    def one(mf: MonthFile) -> tuple:
        # a locally complete month never re-probes the remote: a
        # transient probe failure (or upstream retiring old months)
        # must not demote data already on disk to a gap row
        if not os.path.exists(mf.dest):
            if not probe_url(mf.url):
                return (mf.run_id, mf.year, mf.month, mf.service, mf.url,
                        "brecha", None, None, None)
            try:
                download_file(mf.url, mf.dest, retries, backoff_s)
            except RuntimeError:
                return (mf.run_id, mf.year, mf.month, mf.service, mf.url,
                        "error", None, None, None)
        try:
            n_rows, n_cols = _parquet_footer_meta(mf.dest)
        except (ValueError, OSError):
            # 200-with-an-error-page downloads land here: the artifact
            # is not parquet (pyarrow raises ArrowInvalid, a ValueError,
            # or OSError on a truncated footer). Remove it (its final
            # name would otherwise satisfy the resume rule and poison
            # every rerun) and record the month as error so the next
            # run re-downloads. ONLY corruption-shaped errors may reach
            # this delete: a bare `except Exception` here would let an
            # ImportError (no pyarrow on the driver) destroy every valid
            # download in the grid and record an all-'error' manifest
            # for an environment bug.
            os.remove(mf.dest)
            return (mf.run_id, mf.year, mf.month, mf.service, mf.url,
                    "error", None, None, None)
        return (mf.run_id, mf.year, mf.month, mf.service, mf.url,
                "ok", n_rows, n_cols, os.path.getsize(mf.dest))

    with ThreadPoolExecutor(max_workers=max(1, parallelism)) as pool:
        rows = list(pool.map(one, grid))
    return spark.createDataFrame(rows, MANIFEST_SCHEMA).orderBy(
        "service", "year", "month"
    )
