#!/usr/bin/env python
"""Generate golden-fixture oracle parquet files at sf0.01 for operators with
no closed-form SQL (S2 Hilbert cells, H3-lite, the langid model, simhash /
fingerprint bit mixing, seeded minhash). Run ONCE after any intentional
change to those operators; the committed fixtures then act as regression
oracles for the driver's CORRECTNESS gate.

Usage: python scripts/gen_oracle_fixtures.py
"""
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as entry

SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "oracle_sf0.01")
os.makedirs(OUT, exist_ok=True)

def _flagship_s2() -> pa.Table:
    """doc_id -> level-10 S2 cell of the URL-geocoded point (the one
    flagship column with no closed-form SQL; joined by the hybrid
    flagship_pages oracle)."""
    from incubator_sedona_ray.encoders import s2 as _s2
    from incubator_sedona_ray.pipelines.pages import synth_pages_fn
    from incubator_sedona_ray.text.geocode import geocode_urls

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang", "source", "text"])
    pages = synth_pages_fn(docs)
    lon, lat = geocode_urls(pages["url"])
    cells = _s2.cells_for_points(lon, lat, 10)
    return pa.table({"doc_id": docs["doc_id"], "s2_cell": pa.array(cells)})


EXTRA = {"flagship_s2": _flagship_s2}

# optional argv filter: regenerate only the named fixtures
only = set(sys.argv[1:])

for name in entry._FIXTURE_ORACLES + list(EXTRA):
    if only and name not in only:
        continue
    if name in EXTRA:
        res = EXTRA[name]()
    else:
        res = entry.queries()[name](SF)
    if isinstance(res, pd.DataFrame):
        tbl = pa.Table.from_pandas(res, preserve_index=False)
    elif isinstance(res, pa.Table):
        tbl = res
    else:
        tbl = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    pq.write_table(tbl, os.path.join(OUT, f"{name}.parquet"))
    print(f"{name}: {tbl.num_rows} rows -> fixtures/oracle_sf0.01/{name}.parquet")

ray.shutdown()
