"""S9 PDF renderer: structural validity of the pure-stdlib writer.

Checks the things a PDF reader needs — header/trailer, xref offsets
that actually point at the objects, page count — plus content checks
(cell text present in the uncompressed streams, 38-char truncation,
pagination) against the reference's layout rules (app.py:638-702).
"""

from __future__ import annotations

import datetime as dt
import re

from database_activity_monitoring_dam_system_spark.operators import (
    exports,
    pdf,
)
from database_activity_monitoring_dam_system_spark.plans.dam import _activity

from .conftest import SF_SMOKE

TS = dt.datetime(2026, 1, 2, 3, 4, 5)


def _rows(n):
    return [
        {
            "activity_id": i,
            "username": f"user_{i}",
            "operation_type": "SELECT",
            "table_name": "payments",
            "operation_status": "Success",
            "ip_address": f"10.0.0.{i % 30}",
            "access_timestamp": f"2026-01-0{1 + i % 9}T00:00:00",
            "severity_level": "Low",
        }
        for i in range(n)
    ]


def _check_structure(doc: bytes) -> int:
    """Validate header, xref offsets, trailer; return page count."""
    assert doc.startswith(b"%PDF-1.4")
    assert doc.rstrip().endswith(b"%%EOF")
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", doc)
    assert m, "missing startxref"
    xref_at = int(m.group(1))
    assert doc[xref_at:xref_at + 4] == b"xref"
    # every xref entry must point at "<oid> 0 obj"
    entries = re.findall(rb"(\d{10}) 00000 n", doc[xref_at:])
    assert entries, "no xref entries"
    for i, off in enumerate(entries, start=1):
        at = int(off)
        assert doc[at:].startswith(f"{i} 0 obj".encode()), f"bad offset obj {i}"
    m = re.search(rb"/Count (\d+)", doc)
    assert m
    return int(m.group(1))


def test_activities_pdf_single_page():
    doc = pdf.activities_to_pdf(_rows(10), generated_at=TS)
    assert _check_structure(doc) == 1
    assert b"Activity Log Report" in doc
    assert b"(user_3)" in doc
    assert b"Generated: 2026-01-02 03:04:05  |  Records: 10" in doc


def test_activities_pdf_paginates_and_repeats_header():
    doc = pdf.activities_to_pdf(_rows(200), generated_at=TS)
    pages = _check_structure(doc)
    assert pages >= 3
    # header row re-rendered on every page
    assert doc.count(b"(Timestamp)") == pages
    assert b"(user_199)" in doc


def test_cell_truncation_and_escaping():
    rows = _rows(1)
    rows[0]["username"] = "x" * 60
    rows[0]["table_name"] = "weird(name)\\path"
    doc = pdf.activities_to_pdf(rows, generated_at=TS)
    assert ("(" + "x" * 38 + ")").encode() in doc
    assert b"x" * 39 not in doc
    assert rb"(weird\(name\)\\path)" in doc


def test_empty_rows():
    doc = pdf.activities_to_pdf([], generated_at=TS)
    assert _check_structure(doc) == 1
    assert b"No records found." in doc


def test_compliance_pdf():
    report = {
        "report_type": "weekly",
        "statistics": {
            "total_activities": 120,
            "non_compliant_count": 7,
            "standards_covered": ["GDPR", "SOX", "PCI_DSS"],
        },
        "findings": [
            {"standard": "GDPR", "status": "Non-compliant",
             "issue": "Personal data access without user identification"}
        ] * 120,
    }
    doc = pdf.compliance_to_pdf(report, generated_at=TS)
    pages = _check_structure(doc)
    assert pages >= 2  # 100 findings don't fit one letter page
    assert b"Compliance Report - weekly" in doc
    assert b"(GDPR, SOX, PCI_DSS)" in doc
    assert doc.count(b"(GDPR)") == 100  # findings capped at 100
    assert rb"Findings \(100\)" in doc


def test_pdf_from_engine_frame(spark):
    """End-to-end: engine frame → export_rows → valid PDF."""
    df = _activity(spark, SF_SMOKE).select(
        "activity_id", "username", "operation_type", "table_name",
        "operation_status", "ip_address", "access_timestamp",
    )
    rows = exports.export_rows(df, limit=25)
    doc = pdf.activities_to_pdf(rows, generated_at=TS)
    assert _check_structure(doc) == 1
    assert b"(SELECT)" in doc
