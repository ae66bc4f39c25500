"""Reference time-encoding codecs (SURVEY §1.2 time row, §4 custom work #2).

The reference stores time as one of six integer encodings
(`src/core/sis_dynamic.h:86-91`): W=µs, T=ms, S=sec epoch, M=time_t/60
(minutes), D=yyyymmdd int date, Y=year.  All normalize to TimestampType/
DateType here; the original encoding round-trips via these codecs
(`src/core/sis_time.h:13-68` has the reference's converter family).

All are built-in expression compositions — codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def from_int_date(c: Column) -> Column:
    """D-type `yyyymmdd` int (e.g. 20240131) → DateType (sis_time.h:34-40)."""
    return F.to_date(c.cast("string"), "yyyyMMdd")


def to_int_date(c: Column) -> Column:
    """DateType → yyyymmdd int."""
    return F.date_format(c, "yyyyMMdd").cast("int")


def from_int_time(c: Column) -> Column:
    """hhmmss int (e.g. 93000 = 09:30:00) → seconds-of-day (sis_time.h:41-47)."""
    h = (c / 10000).cast("int")
    m = ((c % 10000) / 100).cast("int")
    s = (c % 100).cast("int")
    return h * 3600 + m * 60 + s


def to_int_time(seconds_of_day: Column) -> Column:
    """seconds-of-day → hhmmss int."""
    h = (seconds_of_day / 3600).cast("int")
    m = ((seconds_of_day % 3600) / 60).cast("int")
    s = (seconds_of_day % 60).cast("int")
    return h * 10000 + m * 100 + s


def from_int_minute(c: Column) -> Column:
    """M-type time_t/60 minutes-since-epoch → TimestampType."""
    return F.timestamp_seconds(c.cast("long") * 60)


def next_workday(d: Column) -> Column:
    """Next weekday after d, skipping Sat/Sun (sis_time.h next-work-day).

    Holiday-aware calendars broadcast-join a calendar table instead
    (SURVEY §2.8 date row); weekend-skip is the reference's built-in rule.
    """
    # weekday(): Monday=0 … Sunday=6; Fri→+3, Sat→+2, else +1
    wd = F.weekday(d)
    return F.when(wd == 4, F.date_add(d, 3)).when(wd == 5, F.date_add(d, 2)).otherwise(
        F.date_add(d, 1)
    )
