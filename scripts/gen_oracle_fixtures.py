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

for name in entry._FIXTURE_ORACLES:
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
