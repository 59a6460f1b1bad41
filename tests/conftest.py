import pytest

from flood_data_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="flood_data_spark-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()


def rows_set(df, ndigits=6):
    """Order-insensitive row comparison helper with float rounding."""
    out = set()
    for row in df.collect():
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, ndigits))
            else:
                vals.append(v)
        out.add(tuple(vals))
    return out
