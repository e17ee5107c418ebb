"""point_in_polygon with a caller-supplied polygon set (the engine is
not tied to the fixture polygons) — Spark result vs NumPy brute force
over the same points, exact set equality."""

import numpy as np

from go_spatial_spark.geocode import geocode
from go_spatial_spark.operators.spatial_join import (
    _ray_cast_np, point_in_polygon, synthetic_polygons,
)


def test_pip_custom_polygon_set(spark, sf01):
    polys = synthetic_polygons(50)
    docs = spark.read.parquet(f"{sf01}/documents.parquet")
    pts = geocode(docs).select("doc_id", "lat", "lon")
    got = {(int(r.doc_id), int(r.polygon_id))
           for r in point_in_polygon(pts, spark, polygons=polys).collect()}

    pdf = pts.toPandas()
    px = pdf["lon"].to_numpy(np.float64)
    py = pdf["lat"].to_numpy(np.float64)
    ids = pdf["doc_id"].to_numpy()
    want = set()
    for pid in polys:
        inside = _ray_cast_np(px, py, pid, polys)
        for did in ids[inside]:
            want.add((int(did), pid))
    assert got == want
    assert len(want) > 0  # the synthetic set actually covers points


def test_synthetic_polygons_deterministic():
    a, b = synthetic_polygons(20), synthetic_polygons(20)
    assert a == b
    assert all(len(ring) >= 5 for ring in a.values())
