"""Date helpers mirroring the reference's string slicing.

format_date (authors.py:251-252) and extract_year (works.py:245-246) are
plain string ops in the reference; they stay string ops here (Turtle-faithful
lexical forms), as native column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def date_only(iso: Column | str) -> Column:
    """ISO datetime → date part: ``split('T')[0]`` (authors.py:252)."""
    return F.substring_index(_col(iso), "T", 1)


def year_of(date_str: Column | str) -> Column:
    """First 4 chars (works.py:246, map_and_align.py:181-182)."""
    return F.substring(_col(date_str), 1, 4)
