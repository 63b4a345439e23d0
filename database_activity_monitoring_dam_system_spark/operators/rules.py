"""Rule engines (SURVEY.md §2.8): security rule battery, alert
classification, compliance explode, query firewall, blacklist semi-join.

The reference evaluates these per-row in Python, re-SELECTing each row
and UPDATEing derived columns in place (app.py:339-411). Here each
engine is ONE declarative projection/explode over the whole frame —
Catalyst fuses the predicate forest into whole-stage codegen, and the
same expressions run unchanged inside Structured Streaming micro-batches.

Parity notes (semantics reproduced from observed behavior):

* The severity assignment is deliberately NOT a lattice max — it
  replays the reference's sequential overwrites exactly
  (app.py:347-403): blacklist sets Critical; guest-write sets High
  UNCONDITIONALLY (can overwrite a prior Critical); sensitive-table /
  off-hours / rate only upgrade from Low; injection sets Critical; a
  sensitive-column hit sets High unless already Critical; large
  extraction upgrades Low→High.
* Only the FIRST matching injection pattern contributes a reason (the
  reference `break`s, app.py:379-381); sensitive columns contribute one
  reason each in list order.
* Reasons join with "; " in rule order (app.py:408).
* Alert-type precedence is case-SENSITIVE substring matching on the
  space-joined reasons (app.py:413-420) — "Rate limit exceeded" does
  NOT match the lowercase "rate limit" probe, so the DoS branch is
  unreachable with the built-in rule set; preserved as-is for parity.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Thresholds / vocabularies mirroring the reference Config (app.py:76-108).
WORKING_HOURS_START = 9
WORKING_HOURS_END = 18
SENSITIVE_TABLES = ("users", "customers", "accounts", "payments", "credit_cards")
SENSITIVE_COLUMNS = ("password", "ssn", "credit_card", "bank_account", "salary")
LARGE_EXTRACTION_ROWS = 1000
MAX_QUERIES_PER_MIN = 100
SOX_TABLES = ("accounts", "financial", "transactions")
PCI_TABLES = ("payments", "credit_cards")
GUEST_WRITE_OPS = ("INSERT", "UPDATE", "DELETE", "DROP", "ALTER")
USER_SENSITIVE_OPS = ("SELECT", "INSERT", "UPDATE")

# 15-pattern threat battery (app.py:86-102): (regex, description).
SUSPICIOUS_QUERY_PATTERNS = (
    (r"union.*select", "SQL Injection - UNION"),
    (r"select.*from.*information_schema", "Schema Enumeration"),
    (r"drop\s+table", "DROP Table Attempt"),
    (r"truncate\s+table", "TRUNCATE Attempt"),
    (r"alter\s+table", "ALTER Table Attempt"),
    (r"create\s+user", "CREATE User Attempt"),
    (r"grant\s+.*\s+to", "Privilege Escalation"),
    (r"exec\s+xp_cmdshell", "xp_cmdshell Attempt"),
    (r"waitfor\s+delay", "Time-based Injection"),
    (r"load_file\s*\(", "File Read Attempt"),
    (r"into\s+outfile", "File Write Attempt"),
    (r"0x[0-9a-f]{10,}", "Hex Encoding Evasion"),
    (r"sleep\s*\(", "Time-based Attack"),
    (r"benchmark\s*\(", "Benchmark Attack"),
    (r"pg_sleep\s*\(", "PostgreSQL Sleep Attack"),
)


_COMBINED_THREAT_RX = "(?i)(" + "|".join(
    f"(?:{p})" for p, _ in SUSPICIOUS_QUERY_PATTERNS
) + ")"


def _first_injection_hit(details_lower: Column) -> Column:
    """First matching pattern's description, else NULL (reference breaks
    after the first hit).

    Guarded by ONE combined alternation so the clean-row majority pays
    a single regex instead of 15; the per-pattern chain (which
    preserves first-match-wins ordering) runs only on guard hits —
    semantically identical by construction (guard ≡ OR of patterns).
    """
    expr = None
    for pattern, desc in SUSPICIOUS_QUERY_PATTERNS:
        cond = details_lower.rlike(f"(?i){pattern}")
        expr = F.when(cond, desc) if expr is None else expr.when(cond, desc)
    chain = expr.otherwise(F.lit(None).cast("string"))
    return F.when(details_lower.rlike(_COMBINED_THREAT_RX), chain).otherwise(
        F.lit(None).cast("string")
    )


def with_rate_counts(
    activity: DataFrame,
    *,
    ts_col: str = "access_timestamp",
    user_col: str = "user_id",
    out_col: str = "queries_last_min",
    salted: bool = False,
) -> DataFrame:
    """Trailing-60s per-user event count (rule 6's event-time analogue).

    The reference counts wall-clock arrivals in a per-user in-memory list
    (app.py:396-403); distributed + replayable form = a range window over
    event time: count of the user's events with ts in [t-59s, t].
    Delegates to the shared range-frame helper so the inclusive-bound
    convention lives in exactly one place.

    ``salted=True`` swaps in the exact skew-split variant
    (``skew.binned_trailing_window_counts``): same results, but the
    exchange keys on (user, minute-bin) so one bot user — exactly the
    hot key this rule exists to catch — spreads over one task per
    minute instead of landing whole on one reducer.  Opt-in because
    the replication doubles shuffled rows; use when a single tenant
    dominates the log.
    """
    if salted:
        from .skew import binned_trailing_window_counts

        return binned_trailing_window_counts(
            activity,
            seconds=60,
            ts_col=ts_col,
            user_col=user_col,
            out_col=out_col,
        )
    from .anomaly import trailing_window_counts

    return trailing_window_counts(
        activity, seconds=60, ts_col=ts_col, user_col=user_col, out_col=out_col
    )


def apply_rule_battery(
    activity: DataFrame,
    users: DataFrame | None = None,
    ip_blacklist: DataFrame | None = None,
    *,
    now: dt.datetime | str | None = None,
    with_rate_rule: bool = True,
    salted_rate: bool = False,
) -> DataFrame:
    """R1 — the 6-family security battery as one projection pass.

    Input: activity-log-shaped frame. Output: same frame + ``role`` +
    ``is_suspicious`` / ``suspicious_reasons`` / ``severity_level``
    (computed BEFORE append — same observable results as the reference's
    INSERT-then-UPDATE, app.py:406-409, without mutation).

    Dimension sides are broadcast: ``users`` and the expiry-filtered
    ``ip_blacklist`` are small (SURVEY.md J1/J3); at 100 TB the fact side
    never shuffles for this operator.

    ``salted_rate=True`` computes the rate rule's trailing count with
    the skew-split (user, minute-bin) window — identical results,
    bounded max task under a single hot tenant (see with_rate_counts).
    """
    df = activity
    if users is not None:
        df = df.join(F.broadcast(users.select("user_id", "role")), "user_id", "left")
    elif "role" not in df.columns:
        df = df.withColumn("role", F.lit(None).cast("string"))

    if ip_blacklist is not None:
        anchor = (
            F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        )
        live = (
            ip_blacklist.filter(F.col("expires_at") > anchor)
            .select("ip_address")
            .distinct()
            .withColumn("_blacklisted", F.lit(True))
        )
        df = df.join(F.broadcast(live), "ip_address", "left")
        blacklisted = F.coalesce(F.col("_blacklisted"), F.lit(False))
    else:
        blacklisted = F.lit(False)

    if with_rate_rule and "queries_last_min" not in df.columns:
        df = with_rate_counts(df, salted=salted_rate)
    rate_count = (
        F.col("queries_last_min") if "queries_last_min" in df.columns else F.lit(0)
    )

    details_lower = F.lower(F.coalesce(F.col("operation_details"), F.lit("")))

    # Stage 1 — materialize the rule flags as NAMED COLUMNS in their
    # own projection (reference evaluation order, app.py:347-403).
    # This is a codegen-size guard, not a semantic change: severity +
    # reasons reference each flag several times, and with the regex
    # machinery inlined at every use the fused reasons expression
    # became one unsplittable >64 KB method (janino refuses; Spark
    # fell back off whole-stage codegen on the alerts path). Behind
    # aliases, each stage-2 expression is a cheap column ref and
    # codegen splits cleanly; CollapseProject keeps the projections
    # separate because the aliases are non-cheap and multiply used.
    hour = F.hour("access_timestamp")
    flags: dict[str, Column] = {
        "_r1": blacklisted,
        "_r2": (F.col("role") == "Guest")
        & F.col("operation_type").isin(*GUEST_WRITE_OPS),
        "_r3": (F.col("role") == "User")
        & F.col("table_name").isin(*SENSITIVE_TABLES)
        & F.col("operation_type").isin(*USER_SENSITIVE_OPS),
        "_r4": F.col("access_timestamp").isNotNull()
        & ((hour < WORKING_HOURS_START) | (hour >= WORKING_HOURS_END)),
        "_inj": _first_injection_hit(details_lower),
        "_r7": F.col("rows_affected").isNotNull()
        & (F.col("rows_affected") > LARGE_EXTRACTION_ROWS),
        # Reference truthiness: `if a['user_id']` (app.py:396) —
        # user_id 0 is treated as missing, same as NULL.
        "_r8": F.col("user_id").isNotNull()
        & (F.col("user_id") != 0)
        & (rate_count > MAX_QUERIES_PER_MIN),
        "_rate_str": rate_count.cast("string"),
    }
    for i, c in enumerate(SENSITIVE_COLUMNS):
        flags[f"_sc{i}"] = details_lower.contains(c)
    flagged = df.withColumns(flags)

    r1, r2, r3, r4 = F.col("_r1"), F.col("_r2"), F.col("_r3"), F.col("_r4")
    r5 = F.col("_inj").isNotNull()
    col_hits = [
        (c, F.col(f"_sc{i}")) for i, c in enumerate(SENSITIVE_COLUMNS)
    ]
    r6 = F.lit(False)
    for _, hit in col_hits:
        r6 = r6 | hit
    r7, r8 = F.col("_r7"), F.col("_r8")

    # Stage 2 — sequential severity overwrites (see module docstring)
    # and reason assembly, over the flag columns.
    sev = F.when(r1, "Critical").otherwise("Low")
    sev = F.when(r2, "High").otherwise(sev)
    sev = F.when(r3 & (sev == "Low"), "Medium").otherwise(sev)
    sev = F.when(r4 & (sev == "Low"), "Medium").otherwise(sev)
    sev = F.when(r5, "Critical").otherwise(sev)
    sev = F.when(r6 & (sev != "Critical"), "High").otherwise(sev)
    sev = F.when(r7 & (sev == "Low"), "High").otherwise(sev)
    sev = F.when(r8 & (sev == "Low"), "Medium").otherwise(sev)

    reasons = F.concat_ws(
        "; ",
        F.when(r1, "IP address is blacklisted"),
        F.when(r2, "Guest attempting write operation"),
        F.when(
            r3,
            F.concat(F.lit("User accessing sensitive table: "), F.col("table_name")),
        ),
        F.when(r4, "Access outside working hours"),
        F.when(r5, F.concat(F.lit("Suspicious pattern: "), F.col("_inj"))),
        *[
            F.when(hit, f"Access to sensitive column: {c}")
            for c, hit in col_hits
        ],
        F.when(
            r7,
            F.concat(
                F.lit("Large data extraction: "),
                F.col("rows_affected").cast("string"),
                F.lit(" rows"),
            ),
        ),
        F.when(
            r8,
            F.concat(
                F.lit("Rate limit exceeded: "),
                F.col("_rate_str"),
                F.lit(" queries/min"),
            ),
        ),
    )

    suspicious = r1 | r2 | r3 | r4 | r5 | r6 | r7 | r8
    out = (
        flagged.withColumn("is_suspicious", suspicious)
        .withColumn(
            "suspicious_reasons", F.when(suspicious, reasons).otherwise(F.lit(None))
        )
        .withColumn(
            "severity_level", F.when(suspicious, sev).otherwise(F.lit("Low"))
        )
    )
    return out.drop("_blacklisted", *flags)


def classify_alert_type(reasons: Column) -> Column:
    """R2 — precedence chain on the space-joined reasons (app.py:413-420).

    Case-sensitive contains, faithfully including the unreachable DoS
    branch (see module docstring).
    """
    return (
        F.when(reasons.contains("SQL Injection"), "SQL Injection")
        .when(reasons.contains("sensitive"), "Data Leakage")
        .when(reasons.contains("rate limit"), "DoS Attempt")
        .otherwise("Security Violation")
    )


def derive_alerts(checked_activity: DataFrame) -> DataFrame:
    """S6 — High/Critical rows become security_alerts rows (app.py:410-424).

    Pure projection on the battery output; in streaming this is the
    filtered branch of the same micro-batch (no second scan).
    """
    high = checked_activity.filter(
        F.col("is_suspicious") & F.col("severity_level").isin("High", "Critical")
    )
    return high.select(
        F.col("activity_id"),
        classify_alert_type(F.col("suspicious_reasons")).alias("alert_type"),
        F.col("severity_level").alias("severity"),
        F.col("suspicious_reasons").alias("description"),
        F.lit("New").alias("status"),
        F.col("access_timestamp").alias("created_at"),
    )


def compliance_findings(activity: DataFrame) -> DataFrame:
    """R3 — per-activity 0..3 findings, exploded (app.py:476-486).

    UDTF-shaped op done with built-ins: conditional struct array →
    filter nulls → explode. GDPR fires on sensitive-table access with
    no user_id; SOX on UPDATE/DELETE of financial tables (Compliant iff
    rows_affected is truthy — NULL or 0 → "Review needed"); PCI_DSS on
    any payments/credit-card access.
    """
    # `if not activity.get('user_id')` (app.py:479): user_id 0 counts
    # as unidentified, same as NULL.
    gdpr = F.when(
        F.col("table_name").isin(*SENSITIVE_TABLES)
        & (F.col("user_id").isNull() | (F.col("user_id") == 0)),
        F.struct(
            F.lit("GDPR").alias("standard"),
            F.lit("Non-compliant").alias("status"),
            F.lit("Personal data access without user identification").alias("issue"),
        ),
    )
    sox = F.when(
        F.col("table_name").isin(*SOX_TABLES)
        & F.col("operation_type").isin("UPDATE", "DELETE"),
        F.struct(
            F.lit("SOX").alias("standard"),
            F.when(
                F.col("rows_affected").isNotNull() & (F.col("rows_affected") != 0),
                "Compliant",
            )
            .otherwise("Review needed")
            .alias("status"),
            F.lit("Financial data modification").alias("issue"),
        ),
    )
    pci = F.when(
        F.col("table_name").isin(*PCI_TABLES),
        F.struct(
            F.lit("PCI_DSS").alias("standard"),
            F.lit("Monitored").alias("status"),
            F.lit("Cardholder data access detected").alias("issue"),
        ),
    )
    findings = F.filter(
        F.array(gdpr, sox, pci), lambda x: x.isNotNull()
    )
    return (
        activity.withColumn("finding", F.explode(findings))
        .select(
            "activity_id",
            F.col("finding.standard").alias("standard"),
            F.col("finding.status").alias("status"),
            F.col("finding.issue").alias("issue"),
        )
    )


def firewall_check(
    queries_df: DataFrame,
    rules: DataFrame,
    *,
    query_col: str = "operation_details",
    user_col: str = "username",
    ip_col: str = "ip_address",
) -> DataFrame:
    """R5/J4/W3 — first-match-by-priority firewall (app.py:829-850).

    Active rules (a tiny dimension) are collected once per call and
    compiled into one ordered first-match scan over the query stream —
    a zero-shuffle projection (SURVEY.md J4's prescription). Match
    semantics: query lowercased; `contains` → lowercase substring;
    `starts_with` → lowercase prefix; `regex` → case-insensitive
    search. Scoped rules require exact user/ip equality. First hit by
    (priority ASC, rule_id ASC) wins — rule_id tie-break pins MySQL's
    unspecified tie order (FIXTURES.md decision #3).

    Callers that hold the rule battery driver-side already (a config
    fixture, a serving cache) should call :func:`firewall_check_rows`
    directly and skip this wrapper's collect round-trip.

    Output: input columns + matched ``rule_id``/``action``/``rule_description``
    (NULL when no rule matches).
    """
    active = rules.filter(F.col("is_active")).select(
        "rule_id", "pattern", "description", "match_type", "action",
        "priority", "applies_to_user", "applies_to_ip", "is_active",
    )
    types = {f.name: f.dataType.simpleString() for f in active.schema.fields}
    return firewall_check_rows(
        queries_df,
        active.collect(),
        query_col=query_col,
        user_col=user_col,
        ip_col=ip_col,
        rule_id_type=types["rule_id"],
    )


def _sql_str(s: str) -> str:
    """A Spark-SQL single-quoted string literal for ``s`` (default
    parser mode: backslash escapes are C-style, so both the escape
    character and the quote must be doubled/escaped)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def firewall_check_rows(
    queries_df: DataFrame,
    rule_rows,
    *,
    query_col: str = "operation_details",
    user_col: str = "username",
    ip_col: str = "ip_address",
    rule_id_type: str = "bigint",
) -> DataFrame:
    """:func:`firewall_check` over a DRIVER-SIDE rule battery —
    ``rule_rows`` is any sequence of mappings (pyspark Rows, dicts)
    with the rule-table fields. Inactive rows are dropped and the
    (priority ASC, rule_id ASC) order applied here, so both entry
    points share one semantics.

    Per-row cost discipline (guide §1.2, §4): the lowercased query is
    hoisted into ONE projected working column every predicate
    references (not re-lowered per rule), and the match chain picks
    the winning rule's ORDINAL — the three output columns then map
    that tiny int to their literals in a second projection. (The
    previous struct-chain form re-evaluated the ENTIRE match chain
    once per extracted field — three copies in the generated code,
    which made cold, not-yet-JITted executions of this zero-shuffle
    scan 3-4x their warm cost on a 7-rule battery.) The chain is
    assembled as ONE parsed SQL expression — a handful of py4j
    round-trips instead of ~100 Column calls (the rotate_vectors
    construction discipline)."""
    for _wc in ("_fw_ql", "_fw_idx"):
        if _wc in queries_df.columns:
            raise ValueError(
                f"firewall_check: input already has a {_wc!r} column "
                "— rename it; the name is reserved as an internal "
                "working column"
            )
    rows = sorted(
        (r for r in rule_rows if r["is_active"]),
        key=lambda r: (
            r["priority"] is None, r["priority"],
            r["rule_id"] is None, r["rule_id"],
        ),
    )
    compiled: list = []  # (hit-predicate SQL, rule) in match order
    for r in rows:
        pat = r["pattern"]
        if pat is None:
            # Reference schema pins pattern NOT NULL (app.py:1476); a
            # NULL slipping in here must not become ''-matches-every-
            # row (the old column-expression form yielded NULL → no
            # match). Empty STRING stays match-all — that is genuine
            # reference behavior (app.py:836 `rule.get("pattern","")`).
            continue
        if r["match_type"] == "contains":
            hit = f"contains(_fw_ql, {_sql_str(pat.lower())})"
        elif r["match_type"] == "starts_with":
            hit = f"startswith(_fw_ql, {_sql_str(pat.lower())})"
        else:
            hit = f"_fw_ql RLIKE {_sql_str('(?i)' + pat)}"
        if r["applies_to_user"] is not None:
            hit = (
                f"(`{user_col}` = {_sql_str(r['applies_to_user'])})"
                f" AND {hit}"
            )
        if r["applies_to_ip"] is not None:
            hit = (
                f"(`{ip_col}` = {_sql_str(r['applies_to_ip'])}) AND {hit}"
            )
        compiled.append((hit, r))
    if compiled:
        idx_sql = "CASE " + " ".join(
            f"WHEN {hit} THEN {i}" for i, (hit, _) in enumerate(compiled)
        ) + " END"
    else:
        idx_sql = "CAST(NULL AS INT)"

    def _pick(field: str, sql_type: str, alias: str) -> str:
        # ordinal -> that rule's literal; NULL ordinal (no match)
        # falls through every branch to NULL — the miss case
        if not compiled:
            return f"CAST(NULL AS {sql_type}) AS `{alias}`"
        arms = " ".join(
            "WHEN _fw_idx = {i} THEN {v}".format(
                i=i,
                v=(
                    f"CAST(NULL AS {sql_type})"
                    if r[field] is None
                    else f"CAST({_sql_str(str(r[field]))} AS {sql_type})"
                ),
            )
            for i, (_, r) in enumerate(compiled)
        )
        return f"CASE {arms} END AS `{alias}`"

    staged = queries_df.selectExpr(
        "*",
        f"lower(coalesce(`{query_col}`, '')) AS _fw_ql",
    ).selectExpr("*", f"{idx_sql} AS _fw_idx")
    return staged.selectExpr(
        *[f"`{c}`" for c in queries_df.columns],
        _pick("rule_id", rule_id_type, "rule_id"),
        _pick("description", "string", "rule_description"),
        _pick("action", "string", "action"),
    )


def blacklist_matches(
    activity: DataFrame,
    ip_blacklist: DataFrame,
    *,
    now: dt.datetime | str | None = None,
) -> DataFrame:
    """J3 — semi-join of activity against the LIVE blacklist.

    Uses current table state with the expiry filter (the reference
    caches the set once at startup and never refreshes, app.py:330-337 —
    documented deviation, FIXTURES.md decision #2).
    """
    anchor = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    live = ip_blacklist.filter(F.col("expires_at") > anchor).select("ip_address")
    return activity.join(F.broadcast(live), "ip_address", "left_semi")
