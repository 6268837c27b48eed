from __future__ import annotations

import pytest

from record_matching_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rmspark-tests", driver_memory="8g",
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def truth_df(spark):
    """Small deterministic synthetic corpus with ground truth (~1-2k rows)."""
    from record_matching_spark.synth import synth_repo_files_with_truth

    df = synth_repo_files_with_truth(spark, n_families=120, seed=42,
                                     members_mean=4, heavy_families=1)
    df = df.cache()
    df.count()
    return df
