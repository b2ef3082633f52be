"""URI-minting and QID column expressions.

The reference mints deterministic ``https://sappho-digital.com/{kind}/{key}``
IRIs with f-strings (e.g. authors.py:277-279, relations.py:280-281). Here
every mint is a Catalyst ``concat`` — constant-folded, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model import SAPPHO, WD


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def mint(kind: str, key: Column | str) -> Column:
    """``https://sappho-digital.com/{kind}/{key}``."""
    return F.concat(F.lit(f"{SAPPHO}{kind}/"), _col(key))


def wd_entity_uri(qid: Column | str) -> Column:
    """``http://www.wikidata.org/entity/{qid}`` (authors.py:267)."""
    return F.concat(F.lit(WD), _col(qid))


def qid_from_uri(uri: Column | str) -> Column:
    """``uri.split('/')[-1]`` (authors.py:324 et al.)."""
    return F.element_at(F.split(_col(uri), "/"), -1)


def timespan_uri(date_value: Column | str) -> Column:
    """date ``YYYY-MM-DD`` → ``timespan/YYYYMMDD``; year → ``timespan/YYYY``
    (authors.py:295-296, works.py:435-443)."""
    return mint("timespan", F.regexp_replace(_col(date_value), "-", ""))


def pair_key(a: Column | str, b: Column | str) -> tuple[Column, Column]:
    """Canonical undirected pair (lexicographic min/max of QIDs,
    relations.py:280-281)."""
    a, b = _col(a), _col(b)
    return F.least(a, b), F.greatest(a, b)
