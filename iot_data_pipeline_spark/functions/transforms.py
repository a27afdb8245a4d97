"""Reference-parity column transforms (pure Catalyst expressions, no UDFs).

These reproduce the observable semantics of the reference's transform stage
(``/root/reference/src/jobs/process_iot_data.py:107-187``) — including its
quirks, which ARE the reference's semantics (SURVEY.md §2A, FIXTURES.md §1):

quirk 1  fraction ``\\.(\\d+)`` is divided by 1e6 regardless of digit count,
         so ``".5"`` contributes 0.0000005, not 0.5;
quirk 2  durations without a fractional dot (``"0 days 00:00:03"``) yield
         NULL: the seconds regex requires a trailing ``.``, the NULL term
         nulls the whole sum, and the fallback maps anything containing
         ``"days"`` to NULL — plain numerics (``"3.12"``) cast directly;
quirk 3  ``local_orig``/``local_resp``: NULL or ``""`` → False, ANY other
         value — including literal ``"F"`` — → True.

Each quirk also has a corrected variant (``*_strict``) kept behind an explicit
opt-in, per SURVEY.md §7 risk 3.

Everything here is a plain Column expression: whole-stage codegen fuses the
regex extracts + arithmetic into one generated operator, so the transform adds
no Python boundary and scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_columns(df: DataFrame) -> DataFrame:
    """Rewrite every column name ``.``→``_`` and ``-``→``_`` (reference P1,
    ``process_iot_data.py:107-113``). Dots collide with Spark's nested-field
    accessor; one ``toDF`` is a metadata-only projection (no job)."""
    return df.toDF(*[c.replace(".", "_").replace("-", "_") for c in df.columns])


def duration_to_seconds(duration: Column) -> Column:
    """Zeek duration string → seconds, reference-exact (quirks 1-2).

    Input shapes: ``"N days HH:MM:SS.ffffff"``, plain numeric ``"3.12"``,
    NULL. Mirrors ``process_iot_data.py:121-156``: five independent
    regexp_extracts (empty match → ``""`` → float cast NULL → NULL-poisoned
    sum), then the contains-"days"-guarded numeric fallback.
    """
    # try_cast, not cast: the reference ran Spark 3.5 non-ANSI where a failed
    # numeric cast yields NULL; under Spark 4's default ANSI mode a plain cast
    # of the empty no-match regexp result would throw instead.
    parsed = (
        F.regexp_extract(duration, r"(\d+)\s+days", 1).try_cast("float") * 86400.0
        + F.regexp_extract(duration, r"days\s+(\d{2}):", 1).try_cast("float") * 3600.0
        + F.regexp_extract(duration, r":(\d{2}):", 1).try_cast("float") * 60.0
        + F.regexp_extract(duration, r":(\d{2})\.", 1).try_cast("float")
        # quirk 1: fixed 1e6 divisor, digit count ignored.
        + F.regexp_extract(duration, r"\.(\d+)", 1).try_cast("float") / 1000000.0
    )
    fallback = F.when(duration.contains("days"), F.lit(None)).otherwise(
        duration.try_cast("float")
    )
    # coalesce ≡ when(parsed.isNull(), fallback).otherwise(parsed), but the
    # 5-regex sum is evaluated ONCE — the when/otherwise form duplicates the
    # whole expression into both branches and codegen does not CSE across
    # them (measured ~2× the per-row cost).
    return F.coalesce(parsed, fallback)


def duration_to_seconds_strict(duration: Column) -> Column:
    """Corrected variant (NOT reference semantics — opt-in): handles missing
    fractions and scales the fraction by its digit count."""
    frac_digits = F.regexp_extract(duration, r"\.(\d+)$", 1)
    parsed = (
        F.regexp_extract(duration, r"(\d+)\s+days", 1).try_cast("double") * 86400.0
        + F.regexp_extract(duration, r"days\s+(\d{2}):", 1).try_cast("double")
        * 3600.0
        + F.regexp_extract(duration, r":(\d{2}):", 1).try_cast("double") * 60.0
        + F.regexp_extract(duration, r":(\d{2})(?:\.|$)", 1).try_cast("double")
        + F.coalesce(
            frac_digits.try_cast("double") / F.pow(10.0, F.length(frac_digits)),
            F.lit(0.0),
        )
    )
    return F.when(duration.contains("days"), parsed).otherwise(
        duration.try_cast("double")
    )


def flag_to_bool(flag: Column) -> Column:
    """Zeek T/F flag string → boolean, reference-exact (quirk 3):
    NULL/empty → False, anything else (even ``"F"``) → True
    (``process_iot_data.py:163-177``)."""
    return (
        F.when(flag.isNull() | (flag == ""), F.lit(False))
        .otherwise(F.lit(True))
        .cast("boolean")
    )


def flag_to_bool_strict(flag: Column) -> Column:
    """Corrected variant (opt-in): ``"T"`` → True, ``"F"`` → False,
    NULL/empty/other → NULL."""
    return (
        F.when(flag == "T", F.lit(True))
        .when(flag == "F", F.lit(False))
        .otherwise(F.lit(None))
        .cast("boolean")
    )


def blank_to_null(col: Column) -> Column:
    """Empty string → NULL (reference F6, ``process_iot_data.py:182-184``).
    Equivalent to SQL ``NULLIF(col, '')``."""
    return F.when(col == "", F.lit(None)).otherwise(col)


def transform_iot(df: DataFrame) -> DataFrame:
    """Full reference transform pipeline over a normalized IoT frame
    (``process_iot_data.py:116-187``): duration → ``duration_sec`` float,
    local_orig/local_resp → ``*_bool``, service blank→NULL; source columns
    dropped. One narrow stage, no shuffle."""
    return (
        df.withColumn("duration_sec", duration_to_seconds(F.col("duration")))
        .drop("duration")
        .withColumn("local_orig_bool", flag_to_bool(F.col("local_orig")))
        .withColumn("local_resp_bool", flag_to_bool(F.col("local_resp")))
        .drop("local_orig", "local_resp")
        .withColumn("service", blank_to_null(F.col("service")))
    )
