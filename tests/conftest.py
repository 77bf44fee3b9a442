import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dupers_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="dupers_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def images_small(spark):
    """Deterministic planted-truth images table, n=200, cached once."""
    from dupers_spark.sources import datagen

    df = datagen.make_images(spark, 200).cache()
    df.count()
    return df


N_SMALL = 200
