import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from temp_c__bpf_osm_reader_spark.session import get_spark
from temp_c__bpf_osm_reader_spark.sources import fixtures

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx():
    """Fixture paths for the smoke scale (1,060 images — reference golden size)."""
    return fixtures.ensure_all_for_sf(SF_SMOKE)


@pytest.fixture(scope="session")
def images_pdf(fx):
    return pd.read_parquet(fx["images"])


@pytest.fixture(scope="session")
def golden_geo_pdf(fx):
    return pd.read_parquet(fx["golden_geo"])


@pytest.fixture(scope="session")
def polygons_pdf(fx):
    return pd.read_parquet(fx["polygons"])
