"""The content-addressed parquet dimension cache must be transparent:
identical dim content on miss, hit, and disabled paths, and a second call
must read the cached tables instead of rebuilding."""

from __future__ import annotations

import os

from wikidata_to_cidoc_crm_spark.fixtures import (
    _DIM_NAMES,
    _world_digest,
    make_world,
    world_to_spark,
)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cache_roundtrip_equals_direct(spark, tmp_path, monkeypatch):
    w = make_world(n_persons=3, n_works=4)
    monkeypatch.setenv("SPARK_GRAFT_WORLD_CACHE", str(tmp_path))
    cached = world_to_spark(spark, w)  # miss: populates
    assert os.path.exists(
        os.path.join(tmp_path, _world_digest(w), "_COMPLETE"))
    hit = world_to_spark(spark, w)  # hit: reads back
    direct = world_to_spark(spark, w, cache=False)
    for name in _DIM_NAMES:
        rows = _sorted_rows(direct[name])
        assert _sorted_rows(cached[name]) == rows, name
        assert _sorted_rows(hit[name]) == rows, name


def test_digest_tracks_content(spark):
    a = make_world(n_persons=3, n_works=4)
    b = make_world(n_persons=3, n_works=4)
    c = make_world(n_persons=4, n_works=4)
    assert _world_digest(a) == _world_digest(b)  # deterministic generation
    assert _world_digest(a) != _world_digest(c)  # content-addressed
