"""Deterministic offline transport — the test/bench stand-in for HTTP.

Mirrors the reference's failure surface (http_request_downloader.py:
101-114): a fetch either succeeds with (status=200, non-empty body), or
fails as an anti-bot blank-200 / HTTP 503 / timeout. Failures are a pure
function of (url_hash, attempt) so the whole crawl is replayable and the
golden simulator computes the identical schedule.

Every successful fetch also carries the image+caption payload
(BASELINE.json input_hint): a deterministic image derived from
(seed_index, page_ordinal) — regenerable independently for the
PSNR/caption invariants.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

from .. import fixtures
from ..functions.imaging import encode_image
from ..schemas import PAGE_ORDINAL

_URL_PAGE = [
    (re.compile(r"/jbgk_(\d{6})\.html"), "OVERVIEW"),
    (re.compile(r"/jjjl_(\d{6})\.html"), "MANAGER"),
    (re.compile(r"/tsdata_(\d{6})\.html"), "METRICS"),
    (re.compile(r"/jjgg_(\d{6})\.html"), "ANNOUNCE"),
    (re.compile(r"code=(\d{6})"), "INCREASE"),
]

# recursive discovery: OVERVIEW and MANAGER pages both link the fund's
# announcements page -> the engine must fetch it exactly once (the
# dedup triangle: batch-distinct, frontier anti-join, seen-set probe)
DISCOVER_SOURCES = ("OVERVIEW", "MANAGER")


def discovered_url(fund_code: str) -> str:
    return "http://fundf10.eastmoney.com/jjgg_" + fund_code + ".html"


FMTS = ("ppm", "bmp", "dctq")


def classify_url(url: str) -> tuple[str | None, str | None]:
    for rx, ptype in _URL_PAGE:
        m = rx.search(url)
        if m:
            return m.group(1), ptype
    return None, None


def fault_kind(url_hash: int, attempt: int, fail_rate: float, max_fail_attempts: int) -> str | None:
    """None = success; else 'blank200' | 'http503' | 'timeout'.
    Deterministic; a URL stops failing after ``max_fail_attempts``
    retries so the crawl always terminates (the reference's infinite
    default would hang on a permanently dead URL — SURVEY.md §4)."""
    if attempt >= max_fail_attempts:
        return None
    h = zlib.crc32(f"{url_hash}:{attempt}".encode())
    if (h % 10_000) < fail_rate * 10_000:
        return ("blank200", "http503", "timeout")[h % 3]
    return None


def image_payload(seed_index: int, page_ordinal: int) -> tuple[bytes, str, str]:
    image_id = f"img_{seed_index}_{page_ordinal}"
    fmt = FMTS[(seed_index + page_ordinal) % len(FMTS)]
    arr = fixtures.make_image(image_id, 32 + (page_ordinal % 4) * 16, 48)
    return encode_image(arr, fmt), fixtures.caption_for(image_id), fmt


def fetch_pandas_batch(pdf: pd.DataFrame, fail_rate: float, max_fail_attempts: int,
                       discover: bool = False) -> pd.DataFrame:
    """Batch fetch: frontier columns in -> FETCHED_SCHEMA columns out.
    Vectorized where it matters; body synthesis is numpy/str work over
    the (small) admitted batch, never row-at-a-time Spark Python."""
    n = len(pdf)
    states, statuses, bodies = [], [], []
    img_bytes, captions, links = [], [], []
    for url, url_hash, retry, seed_idx, ptype in zip(
        pdf["url"], pdf["url_hash"], pdf["retry_count"], pdf["seed_index"], pdf["page_type"]
    ):
        kind = fault_kind(int(url_hash), int(retry), fail_rate, max_fail_attempts)
        if kind is None:
            code, ptype2 = classify_url(url)
            eff = ptype2 or ptype
            if eff == "ANNOUNCE":
                body = "<html>基金公告 " + (code or "") + " 第1页</html>"
            else:
                body = fixtures.page_body(code, eff) if code else "<html>ok</html>"
            ib, cap, _ = image_payload(int(seed_idx), PAGE_ORDINAL.get(ptype, 4))
            states.append("SUCCESS")
            statuses.append(200)
            bodies.append(body)
            img_bytes.append(ib)
            captions.append(cap)
            links.append(
                [discovered_url(code)]
                if discover and code and eff in DISCOVER_SOURCES
                else []
            )
        else:
            # success predicate is status==200 AND non-empty body
            # (http_request_downloader.py:109-111)
            states.append("FALSE")
            statuses.append(200 if kind == "blank200" else (503 if kind == "http503" else 0))
            bodies.append("" if kind == "blank200" else None)
            img_bytes.append(None)
            captions.append(None)
            links.append([])
    out = pd.DataFrame(
        {
            "url_hash": pdf["url_hash"].to_numpy(),
            "url": pdf["url"].to_numpy(),
            "host": pdf["host"].to_numpy(),
            "page_type": pdf["page_type"].to_numpy(),
            "seed_index": pdf["seed_index"].to_numpy(),
            "retry_count": pdf["retry_count"].to_numpy(),
            "state": states,
            "status": pd.array(statuses, dtype="int32"),
            "body": bodies,
            "image_bytes": img_bytes,
            "caption": captions,
            "wave": pdf["wave"].to_numpy(),
            "fetch_order": np.zeros(n, dtype=np.int64),
            "links": links,
            # admission-rank passthrough (crawl-order window input);
            # callers that fetch outside the admit path have no rank
            "host_rank": (
                pdf["host_rank"].to_numpy().astype(np.int32)
                if "host_rank" in pdf.columns
                else np.zeros(n, dtype=np.int32)
            ),
        }
    )
    return out
