"""Export sinks (SURVEY.md S8/S10): CSV and JSON with the reference's
serialization conventions.

The reference caps CSV at 1000 rows / PDF at 500 (app.py:1219,1233)
and isoformats datetimes (app.py:635). Here the cap is a parameter;
distributed writes go through df.write (scales), small API exports
collect through pandas. PDF rendering is presentation-layer (ReportLab
in the reference, app.py:638-702) — out of engine scope by design
(SURVEY.md S9); `export_rows` feeds any renderer.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISO = "yyyy-MM-dd'T'HH:mm:ss"

CSV_EXPORT_LIMIT = 1000
PDF_EXPORT_LIMIT = 500


def _isoformat_timestamps(df: DataFrame) -> DataFrame:
    for field in df.schema.fields:
        if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
            df = df.withColumn(field.name, F.date_format(field.name, ISO))
    return df


def export_csv_distributed(df: DataFrame, path: str) -> None:
    """S8 at scale: header CSV via df.write (one file per partition)."""
    _isoformat_timestamps(df).write.mode("overwrite").option(
        "header", True
    ).csv(path)


def export_csv_string(df: DataFrame, *, limit: int = CSV_EXPORT_LIMIT) -> str:
    """S8 API form: bounded rows → one in-memory CSV document
    (csv.DictWriter equivalent, app.py:626-636)."""
    pdf = _isoformat_timestamps(df.limit(limit)).toPandas()
    buf = io.StringIO()
    pdf.to_csv(buf, index=False)
    return buf.getvalue()


def export_rows(df: DataFrame, *, limit: int = PDF_EXPORT_LIMIT) -> list[dict]:
    """S10/S9 substrate: bounded row dicts with isoformatted datetimes
    (feeds jsonify / any PDF table renderer)."""
    return [
        r.asDict(recursive=True)
        for r in _isoformat_timestamps(df.limit(limit)).collect()
    ]
