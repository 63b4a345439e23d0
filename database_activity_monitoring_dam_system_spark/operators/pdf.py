"""Pure-stdlib PDF rendering (SURVEY.md S9).

The reference renders activity and compliance reports with ReportLab
(app.py:638-702): an A4 table of 8 activity columns (header row styled,
cells truncated to 38 chars) and a letter-size compliance summary with
a stats table plus up to 100 findings. ReportLab is not available in
this environment, and the engine contract keeps presentation out of the
query path — but the *sink* itself is part of the reference surface, so
this module implements it directly against the PDF 1.4 spec with only
the standard library: base-14 Helvetica fonts (no embedding needed),
uncompressed content streams, one page object per page, a correct xref
table. Any PDF 1.4 reader renders the output.

Data flows in through :func:`exports.export_rows` (bounded, isoformat
timestamps), so rendering stays a driver-side finishing step over an
already-LIMITed frame — identical to the reference's 500-row cap
(app.py:1233).
"""

from __future__ import annotations

import datetime as dt
from typing import Sequence

PAGE_A4 = (595, 842)
PAGE_LETTER = (612, 792)

ACTIVITY_COLS = [
    "activity_id", "username", "operation_type", "table_name",
    "operation_status", "ip_address", "access_timestamp", "severity_level",
]
ACTIVITY_HEADERS = [
    "ID", "User", "Operation", "Table", "Status", "IP", "Timestamp",
    "Severity",
]
# reference colWidths=[35,70,65,70,55,90,115,60] (app.py:654)
ACTIVITY_WIDTHS = [35, 70, 65, 70, 55, 90, 115, 60]

_CELL_TRUNC = 38  # app.py:653 truncates every cell to 38 chars
_FONT_SIZE = 7
_ROW_H = 12
_MARGIN = 40


def _esc(s: str) -> str:
    """Escape for a PDF literal string; non-latin-1 → '?' (base-14
    fonts are single-byte WinAnsi)."""
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        elif ch in "\r\n\t":
            out.append(" ")
        elif 32 <= ord(ch) < 256:
            out.append(ch)
        else:
            out.append("?")
    return "".join(out)


def _assemble(pages_content: list[bytes], page_size: tuple[int, int]) -> bytes:
    """Build the object graph: catalog(1) → pages(2) → [page, stream]
    pairs; fonts are objects 3 (regular) and 4 (bold)."""
    w, h = page_size
    n_pages = len(pages_content)
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{5 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    objs[4] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold"
        b" /Encoding /WinAnsiEncoding >>"
    )
    for i, content in enumerate(pages_content):
        page_id, stream_id = 5 + 2 * i, 6 + 2 * i
        objs[page_id] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}]"
            f" /Resources << /Font << /F1 3 0 R /F2 4 0 R >> >>"
            f" /Contents {stream_id} 0 R >>"
        ).encode()
        objs[stream_id] = (
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream"
        )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for oid in sorted(objs):
        offsets[oid] = len(buf)
        buf += f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj\n"
    xref_at = len(buf)
    n = max(objs) + 1
    buf += f"xref\n0 {n}\n".encode()
    buf += b"0000000000 65535 f \n"
    for oid in range(1, n):
        buf += f"{offsets[oid]:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_at}\n"
        "%%EOF"
    ).encode()
    return bytes(buf)


class _Page:
    """One page's content stream: text runs and vector ops."""

    def __init__(self) -> None:
        self.ops: list[str] = []

    def text(self, x: float, y: float, s: str, *, size: int = _FONT_SIZE,
             bold: bool = False, gray: float | None = None) -> None:
        font = "/F2" if bold else "/F1"
        color = f"{gray:.3f} g " if gray is not None else "0 g "
        self.ops.append(
            f"BT {color}{font} {size} Tf {x:.1f} {y:.1f} Td"
            f" ({_esc(s)}) Tj ET"
        )

    def rect(self, x: float, y: float, w: float, h: float,
             gray: float) -> None:
        self.ops.append(f"{gray:.3f} g {x:.1f} {y:.1f} {w:.1f} {h:.1f} re f")

    def hline(self, x0: float, x1: float, y: float) -> None:
        self.ops.append(
            f"0.85 G 0.4 w {x0:.1f} {y:.1f} m {x1:.1f} {y:.1f} l S"
        )

    def render(self) -> bytes:
        return "\n".join(self.ops).encode("latin-1", "replace")


class _TableFlow:
    """Shared table-layout engine: column x-offsets, the styled header
    row, cell truncation, and page-break-with-repeated-header logic
    live HERE, once — both report renderers flow tables through it."""

    def __init__(self, page_size: tuple[int, int]) -> None:
        self.w, self.h = page_size
        self.pages: list[_Page] = [_Page()]
        self.y = self.h - _MARGIN - 20

    @property
    def page(self) -> _Page:
        return self.pages[-1]

    def break_page(self) -> None:
        self.pages.append(_Page())
        self.y = self.h - _MARGIN - 20

    def _header_row(self, xs, headers, table_w) -> None:
        p = self.page
        p.rect(_MARGIN, self.y - _ROW_H + 3, table_w, _ROW_H, 0.12)
        for xcol, head in zip(xs, headers):
            p.text(xcol + 2, self.y - _ROW_H + 6, head, bold=True, gray=1.0)
        self.y -= _ROW_H

    def title_block(self, title: str, *, size: int,
                    subtitle: str | None = None,
                    rule_width: float | None = None) -> None:
        self.page.text(_MARGIN, self.y, title, size=size, bold=True)
        self.y -= size - 2
        if subtitle is not None:
            self.page.text(_MARGIN, self.y, subtitle, size=9, gray=0.45)
            self.y -= 10
        if rule_width is not None:
            self.page.hline(_MARGIN, _MARGIN + rule_width, self.y)
            self.y -= 6

    def table(self, rows, columns, headers, col_widths) -> None:
        table_w = min(sum(col_widths), self.w - 2 * _MARGIN)
        xs = [_MARGIN]
        for cw in col_widths[:-1]:
            xs.append(xs[-1] + cw)
        self._header_row(xs, headers, table_w)
        for row in rows:
            if self.y < _MARGIN + _ROW_H:
                self.break_page()
                self._header_row(xs, headers, table_w)
            for xcol, colname in zip(xs, columns):
                v = row.get(colname)
                self.page.text(
                    xcol + 2, self.y - _ROW_H + 6,
                    str(v if v is not None else "")[:_CELL_TRUNC],
                )
            self.y -= _ROW_H
            self.page.hline(_MARGIN, _MARGIN + table_w, self.y + 3)

    def assemble(self, page_size: tuple[int, int]) -> bytes:
        return _assemble([p.render() for p in self.pages], page_size)


def render_table_pdf(
    rows: Sequence[dict],
    *,
    columns: Sequence[str],
    headers: Sequence[str],
    col_widths: Sequence[int],
    title: str,
    page_size: tuple[int, int] = PAGE_A4,
    generated_at: dt.datetime | None = None,
) -> bytes:
    """Paginated single-table report: title, generated-line, repeated
    header row (bold on dark fill, mirroring the reference's
    TableStyle), truncated cells, light grid rules."""
    ts = (generated_at or dt.datetime.now()).strftime("%Y-%m-%d %H:%M:%S")
    flow = _TableFlow(page_size)
    table_w = min(sum(col_widths), flow.w - 2 * _MARGIN)
    flow.title_block(
        title, size=18,
        subtitle=f"Generated: {ts}  |  Records: {len(rows)}",
        rule_width=table_w,
    )
    flow.table(rows, columns, headers, col_widths)
    if not rows:
        flow.page.text(_MARGIN, flow.y - _ROW_H, "No records found.", size=9)
    return flow.assemble(page_size)


def activities_to_pdf(
    rows: Sequence[dict],
    *,
    title: str = "Activity Log Report",
    generated_at: dt.datetime | None = None,
) -> bytes:
    """S9 activities report (app.py:639-672): feed with
    ``export_rows(df, limit=PDF_EXPORT_LIMIT)``."""
    return render_table_pdf(
        rows,
        columns=ACTIVITY_COLS,
        headers=ACTIVITY_HEADERS,
        col_widths=ACTIVITY_WIDTHS,
        title=title,
        generated_at=generated_at,
    )


def compliance_to_pdf(
    report: dict,
    *,
    generated_at: dt.datetime | None = None,
) -> bytes:
    """S9 compliance report (app.py:675-701): stats summary + up to 100
    findings rows on letter pages."""
    stats = report.get("statistics", {})
    summary = [
        {"k": "Total Activities",
         "v": str(stats.get("total_activities", 0))},
        {"k": "Non-Compliant Events",
         "v": str(stats.get("non_compliant_count", 0))},
        {"k": "Standards",
         "v": ", ".join(stats.get("standards_covered", []))},
    ]
    findings = [
        {"standard": f.get("standard", ""), "status": f.get("status", ""),
         "issue": f.get("issue", "")}
        for f in report.get("findings", [])[:100]  # app.py:697 caps at 100
    ]
    title = f"Compliance Report - {report.get('report_type', 'daily')}"
    if not findings:
        return render_table_pdf(
            summary,
            columns=["k", "v"],
            headers=["Metric", "Value"],
            col_widths=[200, 280],
            title=title,
            page_size=PAGE_LETTER,
            generated_at=generated_at,
        )
    ts = (generated_at or dt.datetime.now()).strftime("%Y-%m-%d %H:%M:%S")
    flow = _TableFlow(PAGE_LETTER)
    flow.title_block(title, size=16, subtitle=f"Generated: {ts}")
    flow.table(summary, ["k", "v"], ["Metric", "Value"], [200, 280])
    flow.y -= 10
    if flow.y < _MARGIN + 4 * _ROW_H:
        flow.break_page()
    flow.title_block(f"Findings ({len(findings)})", size=13)
    flow.table(
        findings, ["standard", "status", "issue"],
        ["Standard", "Status", "Issue"], [80, 90, 310],
    )
    return flow.assemble(PAGE_LETTER)
